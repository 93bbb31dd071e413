"""HyperLogLog sketch operator: bit-exactness vs the pure-python mirror,
mergeability, branch coverage, and the accuracy bound."""

import math
import random

import pandas as pd
import pytest
from pyspark.sql import functions as F

from fia_own_map_spark.operators import sketch


def _df(spark, values, group="g"):
    return spark.createDataFrame(
        pd.DataFrame({"g": [group] * len(values), "v": pd.array(values, dtype="Int64")})
    )


@pytest.fixture(scope="module")
def vals():
    rng = random.Random(7)
    return [rng.randrange(-(2 ** 62), 2 ** 62) for _ in range(4000)]


@pytest.mark.parametrize("p", [5, 8, 12])
def test_registers_bit_exact(spark, vals, p):
    got = {
        r["bucket"]: r["maxrank"]
        for r in sketch.hll_registers(_df(spark, vals), ["g"], "v", p).collect()
    }
    assert got == sketch.hll_registers_py(vals, p)


@pytest.mark.parametrize("p", [5, 8, 12])
def test_estimate_matches_mirror(spark, vals, p):
    # p=12 with n=4000 lands in the linear-counting branch (raw <= 2.5m,
    # zeros > 0); p=5/8 in the harmonic branch — both mirrored bit-exactly.
    (row,) = sketch.approx_distinct(_df(spark, vals), ["g"], "v", p).collect()
    assert row["est_distinct"] == sketch.approx_distinct_py(vals, p)


def test_estimate_accuracy(spark, vals):
    exact = len(set(vals))
    for p in (8, 12):
        est = sketch.approx_distinct_py(vals, p)
        assert abs(est - exact) / exact < 4 * 1.04 / math.sqrt(1 << p)


def test_merge_equals_union(spark, vals):
    """Sketch(A) merged with Sketch(B) must equal Sketch(A ∪ B) exactly —
    with OVERLAPPING halves, the property that makes per-batch register
    tables composable into rollups."""
    a, b = vals[:2500], vals[1500:]  # overlap [1500, 2500)
    merged = sketch.hll_merge(
        sketch.hll_registers(_df(spark, a), ["g"], "v", 8),
        sketch.hll_registers(_df(spark, b), ["g"], "v", 8),
    )
    whole = sketch.hll_registers(_df(spark, vals), ["g"], "v", 8)
    as_map = lambda df: {  # noqa: E731
        (r["g"], r["bucket"]): r["maxrank"] for r in df.collect()
    }
    assert as_map(merged) == as_map(whole)
    (est,) = sketch.hll_estimate(merged, ["g"], 8).collect()
    assert est["est_distinct"] == sketch.approx_distinct_py(vals, 8)


def test_nulls_excluded_and_groups_independent(spark):
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "g": ["x"] * 4 + ["y"] * 3,
                "v": pd.array([1, 2, None, 2, 7, None, 7], dtype="Int64"),
            }
        )
    )
    out = {
        r["g"]: r["est_distinct"]
        for r in sketch.approx_distinct(df, ["g"], "v", 12).collect()
    }
    assert out == {
        "x": sketch.approx_distinct_py([1, 2, 2], 12),
        "y": sketch.approx_distinct_py([7, 7], 12),
    }
    # tiny-n linear counting is near-exact
    assert out["x"] == 2 and out["y"] == 1


def test_bad_precision_rejected(spark):
    with pytest.raises(ValueError):
        sketch.approx_distinct_py([1], 3)


# ---- Count-Min ----


@pytest.fixture(scope="module")
def freq_vals():
    """Skewed multiset: value i appears ~ 50/(i+1) times (heavy hitters
    plus a long tail), signed values included."""
    rng = random.Random(11)
    out = []
    for i in range(200):
        out += [i - 100] * max(1, 50 // (i + 1))
    rng.shuffle(out)
    return out


def test_cms_state_bit_exact(spark, freq_vals):
    got = {
        (r["row"], r["col"]): r["count"]
        for r in sketch.cms_sketch(_df(spark, freq_vals), "v", 4, 256).collect()
    }
    assert got == sketch.cms_sketch_py(freq_vals, 4, 256)


def test_cms_estimate_never_undercounts_and_matches_mirror(spark, freq_vals):
    from collections import Counter

    exact = Counter(freq_vals)
    items = sorted(exact)[:40]
    state = sketch.cms_sketch(_df(spark, freq_vals), "v", 4, 256)
    items_df = spark.createDataFrame(
        pd.DataFrame({"v": pd.array(items, dtype="Int64")})
    )
    est = {
        r["v"]: r["est_count"]
        for r in sketch.cms_estimate(state, items_df, "v", 4, 256).collect()
    }
    grid = sketch.cms_sketch_py(freq_vals, 4, 256)
    for v in items:
        assert est[v] == sketch.cms_estimate_py(grid, v, 4, 256)
        assert est[v] >= exact[v]  # CMS is one-sided


def test_cms_merge_equals_whole(spark, freq_vals):
    a, b = freq_vals[:300], freq_vals[300:]
    merged = sketch.cms_merge(
        sketch.cms_sketch(_df(spark, a), "v", 4, 256),
        sketch.cms_sketch(_df(spark, b), "v", 4, 256),
    )
    as_map = lambda df: {  # noqa: E731
        (r["row"], r["col"]): r["count"] for r in df.collect()
    }
    assert as_map(merged) == sketch.cms_sketch_py(freq_vals, 4, 256)


def test_cms_width_must_be_power_of_two(spark):
    for bad in (0, 1, 100):
        with pytest.raises(ValueError):
            sketch.cms_sketch(_df(spark, [1]), "v", 4, bad)
    with pytest.raises(ValueError):
        sketch.cms_sketch(_df(spark, [1]), "v", 0, 256)


# ---- Bloom ----


def test_bloom_no_false_negatives_and_bit_exact(spark, vals):
    members, others = vals[:800], [v + 1 for v in vals[2000:2400]]
    k, m = 5, 4096
    bloom = sketch.bloom_build(_df(spark, members), "v", k, m)
    bits = {r["bit"] for r in bloom.collect()}
    assert bits == sketch.bloom_build_py(members, k, m)
    probe = _df(spark, members[:100] + others)
    got = {
        r["v"]: r["maybe_present"]
        for r in sketch.bloom_contains(bloom, probe, "v", k, m).collect()
    }
    for v in members[:100]:
        assert got[v] is True  # never false-negative
    for v in others:
        assert got[v] == sketch.bloom_contains_py(bits, v, k, m)


def test_bloom_fp_rate_in_range(spark):
    import math as _m

    members = list(range(1000))
    k, m = 7, 8192
    bits = sketch.bloom_build_py(members, k, m)
    fp = sum(
        1 for v in range(10_000, 14_000) if sketch.bloom_contains_py(bits, v, k, m)
    )
    expected = (1.0 - _m.exp(-k * len(members) / m)) ** k
    assert fp / 4000 < 4 * expected + 0.01

def test_null_probe_semantics(spark):
    """r5 ADVICE: NULL probes used to fall out of the null-rejecting
    join-back (bloom: out_col NULL; cms: a bogus seed-slot estimate).
    Now: bloom_contains gives false for NULL (never inserted => not a
    member); cms_estimate drops the NULL probe row entirely."""
    k, m = 5, 4096
    members = list(range(100))
    bloom = sketch.bloom_build(_df(spark, members), "v", k, m)
    probe = spark.createDataFrame(
        pd.DataFrame({"v": pd.array([1, None, 99], dtype="Int64")})
    )
    got = {
        r["v"]: r["maybe_present"]
        for r in sketch.bloom_contains(bloom, probe, "v", k, m).collect()
    }
    assert got[1] is True and got[99] is True
    assert got[None] is False

    state = sketch.cms_sketch(_df(spark, members), "v", 4, 256)
    est = sketch.cms_estimate(state, probe, "v", 4, 256)
    vals = {r["v"]: r["est_count"] for r in est.collect()}
    assert set(vals) == {1, 99}  # NULL probe row dropped
    assert vals[1] >= 1 and vals[99] >= 1
