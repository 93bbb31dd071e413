"""Source readers + the literal BASELINE criterion: pairwise F1 on sampled
labeled pairs (FIXTURES.md §2 shape) >= 0.99."""

import pandas as pd
from pyspark.sql import functions as F

from fia_own_map_spark.config import EngineConfig
from fia_own_map_spark.operators.dedup import embedding_cosine_pairs
from fia_own_map_spark.plans.pipeline import run_pipeline
from fia_own_map_spark.sources.checkpoint import CheckpointStore
from fia_own_map_spark.sources.readers import (
    read_keyword_config,
    read_typed_csv,
    read_web_pages,
)
from fia_own_map_spark.testing.oracle import labeled_pairs, oracle_clusters


def test_read_web_pages_roundtrip(spark, tiny_pages, tmp_path):
    pages, _ = tiny_pages
    p = str(tmp_path / "pages_parquet")
    spark.createDataFrame(pages).write.parquet(p)
    back = read_web_pages(spark, p)
    assert back.count() == len(pages)
    assert dict(back.dtypes)["html"] == "binary"
    assert dict(back.dtypes)["warc_ts"] == "timestamp"


def test_read_typed_csv_and_keywords(spark, tmp_path):
    csv = tmp_path / "conf.csv"
    csv.write_text("trust_kw,corp_kw\nfamily trust,LLC\nliving trust,\n")
    kw = read_keyword_config(spark, str(csv))
    assert kw["trust_kw"] == ["family trust", "living trust"]
    assert kw["corp_kw"] == ["LLC"]

    data = tmp_path / "d.csv"
    data.write_text("id,val\n1,2.5\n2,\n")
    df = read_typed_csv(spark, str(data), "id bigint, val double")
    rows = {r["id"]: r["val"] for r in df.collect()}
    assert rows == {1: 2.5, 2: None}


def test_labeled_pairs_f1_criterion(spark, tiny_pages, tmp_path):
    """The acceptance criterion in its literal form: sample labeled pairs
    from the golden partition, evaluate the pipeline's pair predictions."""
    pages, _ = tiny_pages
    store = CheckpointStore(str(tmp_path), "crit")
    clusters, _ = run_pipeline(spark, spark.createDataFrame(pages), EngineConfig(), checkpoints=store)
    pred = clusters.select("url", "cluster_id").toPandas()

    records = store.read(spark, "records").select(
        "url", "owner1", "owner2", "own_type", "initial_class", "comb_addr"
    ).toPandas()
    golden = oracle_clusters(records)
    lp = labeled_pairs(golden, records, n_pairs=2000, seed=42)
    assert lp["is_match"].sum() > 200  # sanity: enough positive pairs

    lab = pred.set_index("url")["cluster_id"]
    pred_match = (
        lab.loc[lp["url_a"]].to_numpy() == lab.loc[lp["url_b"]].to_numpy()
    )
    tp = int((pred_match & lp["is_match"].to_numpy()).sum())
    fp = int((pred_match & ~lp["is_match"].to_numpy()).sum())
    fn = int((~pred_match & lp["is_match"].to_numpy()).sum())
    precision = tp / (tp + fp) if tp + fp else 1.0
    recall = tp / (tp + fn) if tp + fn else 1.0
    f1 = 2 * precision * recall / (precision + recall)
    assert f1 >= 0.99, (precision, recall, f1)


def test_embedding_cosine_pairs(spark):
    import numpy as np

    rng = np.random.default_rng(3)
    base = rng.standard_normal((40, 6)).astype("float32")
    # make 41 a near-copy of 0
    rows = [(i, v.tolist()) for i, v in enumerate(base)]
    rows.append((41, (base[0] + rng.standard_normal(6).astype("float32") * 0.01).tolist()))
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["vec_id", "embedding"]))
    got = embedding_cosine_pairs(df, threshold=0.99).toPandas()
    assert (0, 41) in {tuple(x) for x in got[["id_a", "id_b"]].itertuples(index=False)}
    # bucketed variant finds the same pair (copies share sign buckets w.h.p.)
    got_b = embedding_cosine_pairs(df, threshold=0.99, bucket_planes=4).toPandas()
    assert (0, 41) in {tuple(x) for x in got_b[["id_a", "id_b"]].itertuples(index=False)}
