"""Instrumented scoring-kernel probe for the 8->32 scaling investigation.

Runs ONE pinned kernel measurement with knobs from env vars and prints a
JSON line with per-pass walls, so a sweep driver can compare variants:

  KP_CORES         cores (taskset pinning is done by the caller)
  KP_PARTS_MULT    partitions = cores * mult          (default 3)
  KP_ARROW_BATCH   spark.sql.execution.arrow.maxRecordsPerBatch (default 10000)
  KP_REPLICATE     pair-table replication factor      (default 2)
  KP_PASSES        timed passes                       (default 3)
  KP_GC            extra JVM flags (e.g. -XX:+UseParallelGC)
  KP_MODE          persist | parquet (scan per pass)  (default persist)

Usage (from the sweep driver): taskset -c 0-{N-1} python tools/kernel_probe.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    cores = int(os.environ["KP_CORES"])
    parts_mult = int(os.environ.get("KP_PARTS_MULT", "3"))
    arrow_batch = os.environ.get("KP_ARROW_BATCH", "10000")
    replicate = int(os.environ.get("KP_REPLICATE", "2"))
    n_passes = int(os.environ.get("KP_PASSES", "3"))
    gc_flags = os.environ.get("KP_GC", "")
    mode = os.environ.get("KP_MODE", "persist")
    pairs_path = os.environ["KP_PAIRS"]

    from pyspark.sql import functions as F

    from fia_own_map_spark.config import EngineConfig
    from fia_own_map_spark.functions.similarity import similarity_scores
    from fia_own_map_spark.session import build_session

    cfg = EngineConfig()
    extra = {"spark.sql.execution.arrow.maxRecordsPerBatch": arrow_batch}
    if gc_flags:
        extra["spark.driver.extraJavaOptions"] = gc_flags
    t_start = time.time()
    spark = build_session(f"kernel-probe-{cores}", master=f"local[{cores}]",
                          extra_conf=extra)
    warm = spark.range(cores * 4).withColumn("s", F.concat(F.lit("W"), F.col("id")))
    warm = warm.repartition(cores).withColumn("j", similarity_scores("s", "s")["jw"])
    warm.agg(F.sum("j")).collect()
    t_warm = time.time() - t_start

    parts = cores * parts_mult
    base = (
        spark.read.parquet(pairs_path)
        .crossJoin(spark.range(replicate).select(F.col("id").alias("_rep")))
        .repartition(parts)
    )
    if mode == "persist":
        pairs = base.persist()
    else:
        tmp = os.path.join(os.environ.get("KP_TMP", "/tmp"), f"kp_pairs_{cores}_{replicate}")
        if not os.path.exists(os.path.join(tmp, "_SUCCESS")):
            base.write.mode("overwrite").parquet(tmp)
        pairs = spark.read.parquet(tmp)
    t0 = time.time()
    n = pairs.count()
    t_mat = time.time() - t0

    kernel = os.environ.get("KP_KERNEL", "full")  # full | trivial | jvm
    if kernel == "trivial":
        # same Arrow traffic, near-zero python compute: isolates pipe+JVM cost
        import pandas as pd
        from pyspark.sql.functions import pandas_udf
        from pyspark.sql.types import DoubleType, StructField, StructType

        def _trivial(a, b):
            n = len(a)
            return pd.DataFrame({"jw": [0.5] * n, "lev_ratio": [0.5] * n,
                                 "jaccard": [0.5] * n})

        _trivial.__annotations__ = {
            "a": pd.Series, "b": pd.Series, "return": pd.DataFrame
        }
        score_fn = pandas_udf(
            _trivial,
            StructType([StructField("jw", DoubleType()),
                        StructField("lev_ratio", DoubleType()),
                        StructField("jaccard", DoubleType())]),
        )
    else:
        if os.environ.get("KP_SLOWPATH"):
            def score_fn(a, b):
                return similarity_scores(a, b, fast=False)
        else:
            score_fn = similarity_scores

    walls = []
    matches = 0
    for _ in range(n_passes):
        t0 = time.time()
        if kernel == "jvm":
            # no python at all: cache-scan + JVM expression + count
            matches = pairs.filter(
                (F.length("name_a") + F.length("name_b")) % 7 == 0
            ).count()
            walls.append(round(time.time() - t0, 3))
            continue
        scored = pairs.withColumn("_s", score_fn("name_a", "name_b")).select(
            F.col("_s.jw").alias("jw"),
            F.col("_s.lev_ratio").alias("lev_ratio"),
            F.col("_s.jaccard").alias("jaccard"),
        )
        matches = scored.filter(
            (F.col("jw") >= cfg.jw_threshold)
            | (F.col("lev_ratio") >= cfg.lev_ratio_threshold)
            | (F.col("jaccard") >= cfg.jaccard_threshold)
        ).count()
        walls.append(round(time.time() - t0, 3))
    spark.stop()
    best = min(walls)
    print(json.dumps({
        "cores": cores, "parts": parts, "arrow_batch": int(arrow_batch),
        "replicate": replicate, "mode": mode, "gc": gc_flags,
        "pairs": n, "matches": matches,
        "warm_s": round(t_warm, 2), "materialize_s": round(t_mat, 2),
        "walls": walls, "best_wall": best,
        "pairs_per_sec": round(n / best, 1),
    }))


if __name__ == "__main__":
    main()
