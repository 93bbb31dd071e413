"""Streaming windowed aggregation + custom stateful operator vs their batch
equivalents: the same events data streamed in two micro-batches must finish
at exactly the batch answer."""

import pandas as pd
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from fia_own_map_spark.streaming.windows import (
    hourly_event_counts_stream,
    running_user_totals_stream,
)

EVENTS = "/root/testdata/sf0.001/events.parquet"


def _two_file_stream_dir(tmp_path):
    """Split the fixture into two files so maxFilesPerTrigger=1 yields two
    real micro-batches (state must carry across them)."""
    pdf = pq.read_table(EVENTS).to_pandas()
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    src = tmp_path / "stream_src"
    src.mkdir()
    half = len(pdf) // 2
    pdf.iloc[:half].to_parquet(src / "part1.parquet", index=False)
    pdf.iloc[half:].to_parquet(src / "part2.parquet", index=False)
    return src, pdf


def test_windowed_counts_match_batch(spark, tmp_path):
    src, pdf = _two_file_stream_dir(tmp_path)
    batch_df = spark.read.parquet(str(src))
    stream = (
        spark.readStream.schema(batch_df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    out = hourly_event_counts_stream(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("hourly_stream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = spark.sql("select * from hourly_stream").toPandas()
    want = (
        batch_df.groupBy(F.date_trunc("hour", "ts").alias("hour_start"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.avg("value"), 6).alias("avg_value"))
        .toPandas()
    )
    key = ["hour_start", "event_type"]
    got = got.sort_values(key).reset_index(drop=True)
    want = want.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[key + ["n_events", "avg_value"]],
                                  want[key + ["n_events", "avg_value"]])


def test_stateful_running_totals_match_batch(spark, tmp_path):
    src, pdf = _two_file_stream_dir(tmp_path)
    batch_df = spark.read.parquet(str(src))
    stream = (
        spark.readStream.schema(batch_df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    out = running_user_totals_stream(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("totals_stream")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    # update mode emits one row per user per touched batch: last write wins
    got = spark.sql(
        "select user_id, user_n_events, user_total_value from "
        "(select *, row_number() over (partition by user_id order by user_n_events desc) rn "
        "from totals_stream) where rn = 1"
    ).toPandas()
    want = (
        batch_df.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("user_n_events"),
            F.round(F.sum("value"), 4).alias("user_total_value"),
        )
        .toPandas()
    )
    got = got.sort_values("user_id").reset_index(drop=True)
    want = want.sort_values("user_id").reset_index(drop=True)
    assert len(got) == len(want)
    pd.testing.assert_frame_equal(got, want[got.columns.tolist()])