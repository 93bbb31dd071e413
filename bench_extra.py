"""Optimization-round instrumentation (guide §1.1/§1.4) — bench.py is FROZEN
for measurement, so every extra probe lives here.

Modes:
  python bench_extra.py headline [reps]   — phase-A replica: cold + warm pass
      over the same HEADLINE list with the same warm-up and noop sink;
      optional extra warm reps (min reported) to dampen host noise.
  python bench_extra.py explain <dir> [query ...]
      — dump .explain("formatted") of each declared query (default: HEADLINE)
      into <dir>/<query>.txt  (used for plans/r08/*_before|after.txt).
  python bench_extra.py query <name> [reps] — noop-time one query N times.

Timing methodology is identical to bench.py phase_a: same session builder,
same master (local[$SPARK_GRAFT_CPUS]), same $SPARK_GRAFT_SF_DIR data,
noop sink, job descriptions labelled.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")

REPO = os.path.dirname(os.path.abspath(__file__))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

HEADLINE = [
    "tpch_q1_pricing",
    "join_customer_nation_revenue",
    "window_orders_per_customer",
    "priority_dedupe_orders",
    "dedup_exact_keep",
    "text_lang_id",
    "text_quality",
    "ann_cosine_topk",
    "er_score_pairs",
    "dedup_simhash_pairs",
    "dedup_minhash_fast",
    "er_cluster_documents",
]


def _burn(n: int) -> int:
    acc = 0
    for i in range(n):
        acc += i * i
    return acc


def probe() -> tuple[float, float]:
    """(single-core Mops, 32-proc aggregate Mops) — the bench.py throttle
    probe pair; healthy ~17-19 single / ~350-380 aggregate on this host."""
    import multiprocessing as mp

    n = 6_000_000
    t0 = time.time()
    _burn(n)
    single = n / (time.time() - t0)
    with mp.Pool(32) as pool:
        pool.map(_burn, [200_000] * 32)
        t0 = time.time()
        pool.map(_burn, [3_000_000] * 32)
        agg = 32 * 3_000_000 / (time.time() - t0)
    return round(single / 1e6, 2), round(agg / 1e6, 1)


def wait_healthy(max_wait_s: float = 120.0) -> tuple[float, float]:
    """Wait (bounded) for a healthy-ish window; returns the last probe."""
    waited = 0.0
    s, m = probe()
    while (s < 10.0 or m < 200.0) and waited < max_wait_s:
        print(f"  [throttle] single={s} mp32={m} — waiting 20s", flush=True)
        time.sleep(20)
        waited += 20
        s, m = probe()
    return s, m


def _session():
    from fia_own_map_spark.session import build_session

    return build_session("bench-extra", master=f"local[{CPUS}]")


def _queries():
    import __spark_entry__ as entrymod

    return {**entrymod.RETIRED_QUERIES, **entrymod.queries()}


def _warmup(spark):
    from pyspark.sql import functions as F

    from fia_own_map_spark.functions.similarity import similarity_scores

    warm = spark.range(CPUS * 4).withColumn("s", F.concat(F.lit("W"), F.col("id")))
    warm.repartition(CPUS).withColumn(
        "j", similarity_scores("s", "s")["jw"]
    ).agg(F.sum("j")).collect()
    _noop(_queries()["text_token_counts"](spark, SF_DIR))


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def cmd_headline(extra_reps: int = 0) -> None:
    health0 = wait_healthy()
    spark = _session()
    qs = _queries()
    _warmup(spark)
    passes: list[dict[str, float]] = []
    n_passes = 2 + max(0, extra_reps)
    for p in range(n_passes):
        times: dict[str, float] = {}
        t_all = time.time()
        for name in HEADLINE:
            spark.sparkContext.setJobDescription(f"headline:{name} pass{p}")
            t0 = time.time()
            _noop(qs[name](spark, SF_DIR))
            times[name] = round(time.time() - t0, 3)
        times["_total"] = round(time.time() - t_all, 3)
        passes.append(times)
        tag = "cold" if p == 0 else f"warm{p}"
        print(f"[{tag}] " + " ".join(f"{k}={v}" for k, v in times.items()), flush=True)
    warm_min = {
        k: min(ps[k] for ps in passes[1:]) for k in passes[0]
    } if len(passes) > 1 else {}
    health1 = probe()
    out = {
        "sf_dir": SF_DIR, "cpus": CPUS, "cold": passes[0], "warm_min": warm_min,
        "probe_before": health0, "probe_after": health1,
    }
    print(json.dumps(out), flush=True)
    spark.stop()


def cmd_explain(out_dir: str, names: list[str]) -> None:
    """One SUBPROCESS per query: the CacheManager substitutes cached plan
    fragments by analyzed-plan equality ACROSS queries in a shared session
    (er_blocking_keys picks up er_cluster's cached keys subtree), and
    materialized AQE stages render dual Initial/Final sections — both
    silently corrupt before/after plan evidence (CLAUDE.md r8 gotcha)."""
    import subprocess

    names = names or HEADLINE
    if len(names) > 1:
        for name in names:
            subprocess.run(
                [sys.executable, os.path.abspath(__file__), "explain", out_dir, name],
                check=True,
                cwd=REPO,
            )
        return
    os.makedirs(out_dir, exist_ok=True)
    spark = _session()
    qs = _queries()
    import io
    from contextlib import redirect_stdout

    for name in names:
        df = qs[name](spark, SF_DIR)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        with open(os.path.join(out_dir, f"{name}.txt"), "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {out_dir}/{name}.txt", flush=True)
    spark.stop()


def cmd_query(name: str, reps: int) -> None:
    health0 = wait_healthy()
    spark = _session()
    qs = _queries()
    _warmup(spark)
    samples = []
    for r in range(reps):
        spark.sparkContext.setJobDescription(f"query:{name} rep{r}")
        t0 = time.time()
        _noop(qs[name](spark, SF_DIR))
        samples.append(round(time.time() - t0, 3))
        print(f"  rep{r}: {samples[-1]}", flush=True)
    print(
        json.dumps({
            "query": name, "samples": samples, "min": min(samples),
            "probe_before": health0, "probe_after": probe(),
        }),
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "headline"
    if mode == "headline":
        cmd_headline(int(sys.argv[2]) if len(sys.argv) > 2 else 0)
    elif mode == "explain":
        cmd_explain(sys.argv[2], sys.argv[3:])
    elif mode == "query":
        cmd_query(sys.argv[2], int(sys.argv[3]) if len(sys.argv) > 3 else 3)
    else:
        raise SystemExit(f"unknown mode {mode}")
