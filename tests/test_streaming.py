"""Structured Streaming surface: file-source stream -> foreachBatch
incremental ER; final partition equals the one-shot batch partition."""

import time

from fia_own_map_spark.config import EngineConfig
from fia_own_map_spark.plans.pipeline import run_pipeline
from fia_own_map_spark.sources.checkpoint import CheckpointStore
from fia_own_map_spark.sources.readers import WEB_PAGES_SCHEMA
from fia_own_map_spark.sources.webpages import generate_web_pages
from fia_own_map_spark.streaming.ingest import IncrementalER


def _sig(df):
    return {frozenset(g) for _, g in df.groupby("cluster_id")["url"]}


def test_file_stream_ingest_matches_batch(spark, tmp_path):
    pages, _ = generate_web_pages(n_pages=400, seed=55)
    src = tmp_path / "stream_src"
    src.mkdir()
    half = len(pages) // 2

    inc = IncrementalER(spark, str(tmp_path / "state"))
    stream = (
        spark.readStream.schema(WEB_PAGES_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    query = (
        stream.writeStream.foreachBatch(lambda df, bid: inc.process_batch(df, bid))
        .option("checkpointLocation", str(tmp_path / "stream_ckpt"))
        .trigger(availableNow=True)
    )

    # drop both files, then run the availableNow stream to completion
    spark.createDataFrame(pages.iloc[:half]).coalesce(1).write.mode("append").parquet(str(src))
    spark.createDataFrame(pages.iloc[half:]).coalesce(1).write.mode("append").parquet(str(src))
    q = query.start()
    q.awaitTermination(300)
    assert not q.isActive or time.sleep(1) is None

    labels_inc = inc._labels.read()
    from fia_own_map_spark.operators.refine import refine_clusters_by_address

    labels_inc = refine_clusters_by_address(labels_inc).toPandas()

    store = CheckpointStore(str(tmp_path / "batch"), "full")
    clusters, _ = run_pipeline(
        spark, spark.createDataFrame(pages), EngineConfig(), checkpoints=store
    )
    labels_batch = clusters.select("url", "cluster_id").toPandas()

    assert len(labels_inc) == len(pages)
    assert _sig(labels_inc) == _sig(labels_batch)
