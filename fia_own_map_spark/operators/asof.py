"""As-of join — a custom operator Spark lacks natively.

For each left row, attach the most recent right row with the same key and
``right_ts <= left_ts`` (backward as-of, inclusive — DuckDB/pandas
``ASOF JOIN`` semantics).

Scale design: the naive formulation is a range join (|L| x |R| blow-up per
key before filtering). This implementation is the union-sort trick instead:
tag the sides, union on (key, ts), and carry right values forward with
``last(ignorenulls)`` over an ordered window — ONE shuffle on the key, no
pair materialization, cost O((|L|+|R|) log) per key group. Ties at equal ts
order the right row first, which yields the inclusive (<=) match.

Right rows must be unique per (key, ts) — pre-aggregate with max_by for a
deterministic pick (the query/oracle do exactly that).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


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
            *key_cols, F.col(right_ts).alias("_t"), *right_value_cols
        ).withColumn("_side", F.lit(0))
    )
    u = lt.unionByName(rt, allowMissingColumns=True)
    w = (
        Window.partitionBy(*key_cols)
        .orderBy("_t", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    for v in right_value_cols:
        u = u.withColumn(v, F.last(v, ignorenulls=True).over(w))
    return u.filter(F.col("_side") == 1).drop("_t", "_side")
