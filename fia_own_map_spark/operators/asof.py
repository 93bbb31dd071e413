"""As-of join — a custom operator Spark lacks natively.

For each left row, attach the most recent right row with the same key and
``right_ts <= left_ts`` (backward as-of, inclusive — DuckDB/pandas
``ASOF JOIN`` semantics).

Scale design: the naive formulation is a range join (|L| x |R| blow-up per
key before filtering). This implementation is the union-sort trick instead:
tag the sides, union on (key, ts), and carry the right ROW (one struct)
forward with ``last(ignorenulls)`` over an ordered window — ONE shuffle, no
pair materialization, cost O((|L|+|R|) log) per key group. Ties at equal ts
order the right row first, which yields the inclusive (<=) match.

Right rows must be unique per (key, ts) — pre-aggregate with max_by for a
deterministic pick (the query/oracle do exactly that).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def point_in_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    key_cols: list[str],
    point_col: str,
    lo_col: str,
    hi_col: str,
    bin_width: float,
) -> DataFrame:
    """Range join (point-in-interval, inclusive bounds) via bin bucketing.

    Spark executes a raw inequality join as a broadcast-nested-loop —
    quadratic per key. Instead: intervals explode to the bins they cover,
    points map to their single bin, and the match becomes an equi-join on
    (keys, bin) + an exact bound filter. Cost is linear in points plus
    intervals x bins-per-interval; pick ``bin_width`` near the typical
    interval length so that factor stays ~2. No dedup needed: a point has
    exactly one bin, and an interval appears once per bin."""
    pb = points.withColumn("_bin", F.floor(F.col(point_col) / F.lit(bin_width)))
    ib = intervals.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / F.lit(bin_width)).cast("long"),
                F.floor(F.col(hi_col) / F.lit(bin_width)).cast("long"),
            )
        ),
    )
    return (
        pb.join(ib, [*key_cols, "_bin"])
        .filter((F.col(point_col) >= F.col(lo_col)) & (F.col(point_col) <= F.col(hi_col)))
        .drop("_bin")
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    left_ts: str,
    right_ts: str,
    right_value_cols: list[str],
) -> DataFrame:
    """Backward as-of join; returns left's columns + right_value_cols (null
    when no earlier right row exists for the key)."""
    lt = left.withColumn("_t", F.col(left_ts)).withColumn("_side", F.lit(1))
    rt = (
        right.select(
            *key_cols,
            F.col(right_ts).alias("_t"),
            # Pack the right row's values into ONE struct so the forward
            # carry tracks whole rows: a matched right row whose own value
            # is NULL stays NULL instead of inheriting an older non-null
            # value (last(col, ignorenulls) per-column would conflate
            # "no right row yet" with "right value is NULL").
            F.struct(*right_value_cols).alias("_rv"),
        ).withColumn("_side", F.lit(0))
    )
    u = lt.unionByName(rt, allowMissingColumns=True)
    w = (
        Window.partitionBy(*key_cols)
        .orderBy("_t", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = u.withColumn("_rv", F.last("_rv", ignorenulls=True).over(w))
    for v in right_value_cols:
        u = u.withColumn(v, F.col("_rv")[v])
    return u.filter(F.col("_side") == 1).drop("_t", "_side", "_rv")
