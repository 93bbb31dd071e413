"""SparkSession builders tuned for this engine.

Defaults target the sandbox (single JVM, ``local[N]``) but every knob is the
one you would set on a real 1000-executor cluster: AQE on (skew-join + coalesce
partitions), Arrow on for pandas UDFs, shuffle partitions sized to cores.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def build_session(
    app_name: str = "fia_own_map_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or get) a SparkSession with engine defaults.

    master defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default 32).
    shuffle_partitions defaults to a JOB-level constant (32, env
    ``SPARK_GRAFT_SHUFFLE_PARTITIONS``) that does NOT vary with the session's
    core count: on a real cluster the shuffle width is a property of the
    data/job, not of how many executors happen to be attached, and AQE
    (parallelismFirst=false below) coalesces down to data size from there.
    Deriving it from cores — the previous behavior — gave different task
    counts (and checkpoint file counts) at every parallelism level, which
    both skewed the N vs 4N scaling comparison and made small cached tables
    explode into per-core micro-tasks at high core counts. Measured on the
    200k-page ER bench: constant 32 gives every level its near-best time
    (local[8] 44s, local[32] 39s vs 41/50 with the per-core derivation).
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # AQE: runtime re-planning, skew-join splitting, partition coalescing.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Coalesce by DATA SIZE, not core count: with the default
        # parallelismFirst=true AQE keeps ~one (tiny) partition per core, so
        # doubling cores doubles the per-task fixed costs (scheduling, python
        # worker Arrow streams, output files) of every small shuffle — the
        # measured cause of the full-ER-job anti-scaling from 8 to 32 cores
        # at the 200k-page bench size. Partition count now follows input
        # bytes (identical at every core count); compute-bound pre-UDF paths
        # keep full parallelism via their explicit repartition (scoring.py).
        # Spark's own docs recommend parallelismFirst=false in production.
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
        # Arrow for pandas UDFs / toPandas — the only Python hot path allowed.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # Byte cap on Arrow batches (whichever of the two limits hits first):
        # the record cap alone lets a binary-blob column (html in stage 0,
        # media blobs) balloon a 10k-row batch to row_bytes*10k per
        # concurrent task — at production html sizes (~100 KB) that is ~1 GiB
        # per task in flight. 64 MiB bounds the per-task working set of every
        # pandas-UDF stage independently of blob size (r4 verdict item #1).
        .config(
            "spark.sql.execution.arrow.maxBytesPerBatch",
            os.environ.get("SPARK_GRAFT_ARROW_MAX_BYTES", str(64 * 1024 * 1024)),
        )
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Broadcast threshold: dimension tables (keyword maps, block stats)
        # should broadcast; 64MB is a deliberate bump from the 10MB default.
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    return builder.getOrCreate()


def stop_session() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
