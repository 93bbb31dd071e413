"""Instrumented stage-0 (html extract + classify) probe for the r4 verdict's
32-core anti-scaling investigation (VERDICT r4 "What's wrong" #3).

Runs ONE pinned measurement at KP_CORES and prints a JSON line with walls for
three nested variants, so the bottleneck can be attributed:

  extract_only   scan -> html pandas-UDF extract -> length agg (no classify,
                 no write): isolates the binary-column Arrow path
  stage0_noop    full stage0_records -> noop sink (no checkpoint IO)
  stage0_write   full stage0_records -> parquet checkpoint write (the real
                 stage 0 as run_pipeline executes it)

Knobs (env):
  KP_CORES        cores (caller does the taskset pinning)
  KP_CORPUS       pages parquet path
  KP_ARROW_BATCH  spark.sql.execution.arrow.maxRecordsPerBatch (default 10000)
  KP_MAX_PART     spark.sql.files.maxPartitionBytes (default 8m, like bench)
  KP_HEAP         spark.driver.memory (default 24g, like bench)
  KP_GC           extra JVM flags
  KP_VARIANTS     comma list of variants to run (default all three)
  KP_WRITERS      if set, coalesce to this many tasks before the checkpoint

Usage: taskset -c 0-{N-1} python tools/stage0_probe.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    cores = int(os.environ["KP_CORES"])
    corpus = os.environ["KP_CORPUS"]
    arrow_batch = os.environ.get("KP_ARROW_BATCH", "10000")
    max_part = os.environ.get("KP_MAX_PART", str(8 * 1024 * 1024))
    heap = os.environ.get("KP_HEAP", "24g")
    variants = os.environ.get(
        "KP_VARIANTS", "extract_only,stage0_noop,stage0_write"
    ).split(",")

    from pyspark.sql import functions as F

    from fia_own_map_spark.plans.pipeline import stage0_records
    from fia_own_map_spark.operators.extract import extract_text
    from fia_own_map_spark.session import build_session
    from fia_own_map_spark.sources.checkpoint import CheckpointStore

    extra = {
        "spark.sql.files.maxPartitionBytes": max_part,
        "spark.driver.memory": heap,
        "spark.sql.execution.arrow.maxRecordsPerBatch": arrow_batch,
    }
    if os.environ.get("KP_GC"):
        extra["spark.driver.extraJavaOptions"] = os.environ["KP_GC"]
    spark = build_session(f"stage0-probe-{cores}", master=f"local[{cores}]",
                         extra_conf=extra)
    # same warm-up as bench: spawn python workers + JIT once
    from fia_own_map_spark.functions.similarity import similarity_scores

    warm = spark.range(cores * 4).withColumn("s", F.concat(F.lit("W"), F.col("id")))
    warm.repartition(cores).withColumn("j", similarity_scores("s", "s")["jw"]).agg(
        F.sum("j")
    ).collect()

    pages = spark.read.parquet(corpus)
    out: dict = {"cores": cores, "arrow_batch": int(arrow_batch),
                 "max_part": int(max_part)}

    sc = spark.sparkContext

    n_rep = int(os.environ.get("KP_REPEAT", "1"))

    def timed(name, fn):
        walls = []
        for _ in range(n_rep):
            t0 = time.time()
            fn()
            walls.append(round(time.time() - t0, 2))
        out[name] = walls[0] if n_rep == 1 else walls
        print(f"  {name}@{cores}: {out[name]}", file=sys.stderr, flush=True)

    if "extract_only" in variants:
        timed(
            "extract_only",
            lambda: pages.select(
                F.length(extract_text("html")).alias("n")
            ).agg(F.sum("n")).collect(),
        )
    if "stage0_noop" in variants:
        timed(
            "stage0_noop",
            lambda: stage0_records(pages)
            .select(
                "url", "warc_ts", "lang", "owner1", "owner2", "simple_owners",
                "tokens", "name_keys", "comb_addr", "initial_class", "own_type",
                "rule_matched",
            )
            .write.format("noop").mode("overwrite").save(),
        )
    if "stage0_write" in variants:
        root = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".bench_cache", f"stage0_probe_{cores}",
        )
        records = stage0_records(pages)
        sel = records.select(
            "url", "warc_ts", "lang", "owner1", "owner2", "simple_owners",
            "tokens", "name_keys", "comb_addr", "initial_class", "own_type",
            "rule_matched",
        )
        writers = os.environ.get("KP_WRITERS")
        if writers:
            sel = sel.repartition(int(writers))

        def _write_once():
            # fresh store per rep — a committed checkpoint makes write a no-op
            shutil.rmtree(root, ignore_errors=True)
            CheckpointStore(root, "probe").write("records", sel)

        timed("stage0_write", _write_once)
    # executor GC time accumulated over the run (driver == executor in local)
    try:
        import py4j  # noqa: F401
        beans = spark._jvm.java.lang.management.ManagementFactory.getGarbageCollectorMXBeans()
        out["gc_ms"] = sum(beans.get(i).getCollectionTime() for i in range(beans.size()))
    except Exception:
        pass
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
