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
