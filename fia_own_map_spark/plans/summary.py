"""Summary stage — per-owner aggregates + final schema (SURVEY.md §2.4/§2.8,
reference `Summary_Script_opt.py`).

The reference enriches the matched table with per-owner totals via
dict-backed `.map` joins (SS:105-117) and recodes/renames to the published
schema (SS:64-70, SS:132-184). Here: per-cluster groupBy totals joined
back (skew-safe — SURVEY W1/A5/A6), one CASE recode, declarative renames,
and ensure-columns-with-default (F22).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fia_own_map_spark.config import (
    CLASS_OTHER_CORP_42,
    CLASS_OTHER_CORP_43,
)

# analogue of the acres-per-unit constant at SS:107 (documented magic number)
_ACRES_PER_UNIT = 247.10538146717


def reclass_own_type(col) -> F.Column:
    """SS:64-70: 42/43 -> 'Other Private', 0 -> 'Public', else pass-through
    label groups."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.when(c.isin(CLASS_OTHER_CORP_42, CLASS_OTHER_CORP_43), F.lit("Other Private"))
        .when(c == 0, F.lit("Public"))
        .when(c.isin(25, 31, 32), F.lit("Public"))
        .when(c == 45, F.lit("Family"))
        .when(c == 41, F.lit("Corporate"))
        .otherwise(F.lit("Unknown"))
    )


def summarize_clusters(
    clusters: DataFrame,
    cluster_col: str = "cluster_id",
    weight_col: str | None = None,
) -> DataFrame:
    """Attach per-owner totals (SS:105-117 semantics):
      total_parcels_owned  — count(*) over cluster (NM:242)
      total_weight_owned   — sum(weight) over cluster when a weight column
                             exists (forest-acres analogue)
    plus the reclassed ownership group label. groupBy + join back rather
    than cluster-partition windows — the giant head cluster would be one
    spilling window task (see refine.cluster_size)."""
    cols = clusters.columns
    aggs = [F.count(F.lit(1)).alias("total_parcels_owned")]
    extra = ["total_parcels_owned"]
    if weight_col is not None:
        aggs.append(F.round(F.sum(weight_col), 6).alias("total_weight_owned"))
        extra.append("total_weight_owned")
    totals = clusters.groupBy(cluster_col).agg(*aggs)
    out = clusters.join(totals, cluster_col).select(*cols, *extra)
    if "own_type" in out.columns:
        out = out.withColumn("own_group", reclass_own_type("own_type"))
    return out


def ensure_columns(df: DataFrame, defaults: dict[str, object]) -> DataFrame:
    """F22 (SS:177-180): add absent columns with a default literal."""
    for name, default in defaults.items():
        if name not in df.columns:
            df = df.withColumn(name, F.lit(default))
    return df


def to_final_schema(df: DataFrame, renames: dict[str, str], ordered: list[str]) -> DataFrame:
    """F21 (SS:132-184): rename to the published schema + column order."""
    out = df.withColumnsRenamed(renames)
    return out.select(*[c for c in ordered if c in out.columns])
