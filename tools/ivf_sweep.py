"""IVF recall-per-probe-fraction frontier sweep (r4 verdict item #5).

For each (n_cells, nprobe) config: recall@10 of ivf_cosine_topk vs the
oracle-green brute-force baseline, plus the measured candidate fraction
(corpus rows in probed cells / corpus x queries) — the probe budget the
recall is bought with.

r5 measured frontier at sf0.1 (5 queries, 10k vectors):

    cells=8  nprobe=3  recall=0.680 frac=0.377   (r4 contract config)
    cells=16 nprobe=3  recall=0.600 frac=0.210
    cells=16 nprobe=5  recall=0.700 frac=0.363
    cells=24 nprobe=4  recall=0.640 frac=0.189
    cells=32 nprobe=5  recall=0.660 frac=0.183
    cells=32 nprobe=6  recall=0.680 frac=0.219   <- r5 contract config
    cells=32 nprobe=8  recall=0.720 frac=0.289

(32, 6) matches OR-amplified LSH's recall (0.68) at a smaller fraction
(0.219 vs 0.244) and the old (8, 3) recall at 42% less probing — finer
quantization buys selectivity; nprobe buys back cell-boundary misses.

Usage: python tools/ivf_sweep.py [sf_dir]   (do NOT run while bench.py runs)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CONFIGS = [(8, 3), (16, 3), (16, 4), (16, 5), (24, 4), (32, 5), (32, 6), (32, 8)]


def main() -> None:
    from pyspark.sql import functions as F

    from fia_own_map_spark.operators import ann
    from fia_own_map_spark.operators.ann import _probe_cells, ivf_cosine_topk, ivf_index
    from fia_own_map_spark.session import build_session

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = build_session("ivf-sweep", master="local[16]")
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(os.path.join(sf, "embeddings.parquet"))
    n_corpus = emb.count()
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    n_q = queries.count()
    truth = ann.cosine_topk(emb, queries, k=10).toPandas()

    for n_cells, nprobe in CONFIGS:
        indexed, cents = ivf_index(emb, n_cells=n_cells)
        approx = ivf_cosine_topk(
            emb, queries, k=10, n_cells=n_cells, nprobe=nprobe,
            indexed=indexed, centroids=cents,
        ).toPandas()
        q = _probe_cells(
            queries.select("query_id", F.col("embedding").alias("_qvec")),
            cents, nprobe, "_qvec",
        )
        frac = indexed.join(F.broadcast(q), "_cell").count() / (n_corpus * n_q)
        recalls = []
        for qid, grp in truth.groupby("query_id"):
            want = set(grp["vec_id"])
            got = set(approx[approx["query_id"] == qid]["vec_id"])
            recalls.append(len(want & got) / len(want))
        print(
            f"cells={n_cells} nprobe={nprobe} "
            f"recall={sum(recalls) / len(recalls):.3f} frac={frac:.3f}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
