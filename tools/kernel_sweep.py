"""Sweep driver for kernel_probe: interleaves 8- and 32-core pinned runs per
variant (noisy host — interleaving shares throttle windows across levels),
prints pps at both levels + the 8->32 scaling efficiency per variant.

Usage: python tools/kernel_sweep.py [variant ...]   (default: all)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PAIRS = os.path.join(REPO, ".bench_cache", "score_pairs_60000")

VARIANTS: dict[str, dict[str, str]] = {
    "baseline": {},
    "parts8x": {"KP_PARTS_MULT": "8"},
    "arrow20k": {"KP_ARROW_BATCH": "20000"},
    "arrow40k": {"KP_ARROW_BATCH": "40000"},
    "rep4": {"KP_REPLICATE": "4"},
    "parallelgc": {"KP_GC": "-XX:+UseParallelGC"},
    "parquet": {"KP_MODE": "parquet"},
    "combo": {"KP_PARTS_MULT": "8", "KP_ARROW_BATCH": "20000", "KP_REPLICATE": "4"},
    "rep4_a20": {"KP_REPLICATE": "4", "KP_ARROW_BATCH": "20000"},
    "rep4_a40": {"KP_REPLICATE": "4", "KP_ARROW_BATCH": "40000"},
    "rep4_a20_gc": {"KP_REPLICATE": "4", "KP_ARROW_BATCH": "20000", "KP_GC": "-XX:+UseParallelGC"},
    "trivial": {"KP_KERNEL": "trivial", "KP_ARROW_BATCH": "20000"},
    "jvmonly": {"KP_KERNEL": "jvm"},
    "slow_a20": {"KP_ARROW_BATCH": "20000", "KP_SLOWPATH": "1"},
    "slow_r4a20": {"KP_REPLICATE": "4", "KP_ARROW_BATCH": "20000", "KP_SLOWPATH": "1"},
    # per-task fixed-cost amortization probes: fewer/bigger tasks, more work
    "r4p1a20": {"KP_REPLICATE": "4", "KP_PARTS_MULT": "1", "KP_ARROW_BATCH": "20000"},
    "r16a20": {"KP_REPLICATE": "16", "KP_ARROW_BATCH": "20000", "KP_PASSES": "2"},
    "r16p1a20": {"KP_REPLICATE": "16", "KP_PARTS_MULT": "1", "KP_ARROW_BATCH": "20000",
                 "KP_PASSES": "2"},
    "r16a40": {"KP_REPLICATE": "16", "KP_ARROW_BATCH": "40000", "KP_PASSES": "2"},
    "r16a80": {"KP_REPLICATE": "16", "KP_ARROW_BATCH": "80000", "KP_PASSES": "2"},
    "r16a40gc": {"KP_REPLICATE": "16", "KP_ARROW_BATCH": "40000", "KP_PASSES": "2",
                 "KP_GC": "-XX:+UseParallelGC"},
}


def run(cores: int, env_extra: dict[str, str]) -> dict:
    env = dict(os.environ)
    env.update(env_extra)
    env["KP_CORES"] = str(cores)
    env["KP_PAIRS"] = PAIRS
    cmd = ["taskset", "-c", f"0-{cores - 1}", sys.executable,
           os.path.join(REPO, "tools", "kernel_probe.py")]
    out = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO, env=env)
    for line in reversed(out.stdout.strip().splitlines()):
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(out.stderr[-2000:])


def main() -> None:
    names = sys.argv[1:] or list(VARIANTS)
    repeats = int(os.environ.get("KS_REPEATS", "2"))
    results: dict[str, dict[int, list[dict]]] = {n: {8: [], 32: []} for n in names}
    for rep in range(repeats):
        for name in names:
            for cores in (8, 32):
                t0 = time.time()
                r = run(cores, VARIANTS[name])
                results[name][cores].append(r)
                print(f"[{rep}] {name}@{cores}: pps={r['pairs_per_sec']} "
                      f"walls={r['walls']} warm={r['warm_s']} mat={r['materialize_s']} "
                      f"({round(time.time() - t0, 1)}s total)", flush=True)
    print("\n== summary (best-of across repeats) ==")
    for name in names:
        b8 = max(r["pairs_per_sec"] for r in results[name][8])
        b32 = max(r["pairs_per_sec"] for r in results[name][32])
        print(f"{name:12s} pps8={b8:>10.0f} pps32={b32:>10.0f} "
              f"ratio={b32 / b8:.2f} eff={(b32 / b8) / 4:.3f}")


if __name__ == "__main__":
    main()
