"""Cluster refinement + window-function operators (SURVEY.md §2.5).

  * address refinement (W4, `Name_Matching_opt.py:115-129,225-227`): within a
    family/juniors cluster, if more than one distinct mailing address exists,
    split the cluster by address. The reference assigns fresh uuid4s per
    address; here the split id is the deterministic min(id) within
    (cluster, address) — pure window expressions, no UDF.
  * priority dedupe (W2, `Preprocessing_opt.py:231-237`) and first-wins
    dedupe with an explicit deterministic order (W3, `Classify_Unknowns_opt.py:669`
    — pandas keep='first' is arrival-order, which is undefined in a
    distributed engine, so the order column is mandatory here).
  * stratified sample per group (W5, `Full_State_Sample_Generation.py:91-96`).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from fia_own_map_spark.config import CLASS_FAMILY


def refine_clusters_by_address(
    clustered: DataFrame,
    id_col: str = "url",
    cluster_col: str = "cluster_id",
    addr_col: str = "comb_addr",
    class_col: str = "own_type",
    refine_classes: tuple[int, ...] = (CLASS_FAMILY,),
) -> DataFrame:
    """Split multi-address clusters for the refine_classes (family + juniors
    are both own_type 45 in the reference, split via initial_class==3).

    Implemented as groupBy aggregations joined back, NOT windows over the
    cluster partition: transitive closure produces a giant head component
    (31k+ nodes at the 800k-page bench corpus), and a window puts that
    cluster's every record in ONE spilling task (AQE cannot split window
    partitions). The groupBy reduces map-side; the join back is
    skew-splittable. ``_addr_k`` coalesces NULL addresses so the join
    reproduces the window's null-as-a-group semantics exactly."""
    cols = clustered.columns
    df = clustered.withColumn("_addr_k", F.coalesce(F.col(addr_col), F.lit("\x00null")))
    # count_distinct ignores NULL addresses — the collect_set semantics of
    # the original window formulation (a NULL addr never triggers a split;
    # the _addr_k sentinel below only groups NULL rows for the split id)
    addr_counts = df.groupBy(cluster_col).agg(
        F.count_distinct(addr_col).alias("_n_addr")
    )
    split_ids = df.groupBy(cluster_col, "_addr_k").agg(F.min(id_col).alias("_split_id"))
    out = (
        df.join(addr_counts, cluster_col)
        .join(split_ids, [cluster_col, "_addr_k"])
    )
    needs_split = F.col(class_col).isin(list(refine_classes)) & (F.col("_n_addr") > 1)
    return out.withColumn(
        cluster_col, F.when(needs_split, F.col("_split_id")).otherwise(F.col(cluster_col))
    ).select(*cols)


def dedupe_first(df: DataFrame, key_cols: list[str], order_cols: list[Column | str]) -> DataFrame:
    """W3: keep exactly one row per key under an explicit deterministic order."""
    w = Window.partitionBy(*key_cols).orderBy(*order_cols)
    return (
        df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")
    )


def dedupe_priority(
    df: DataFrame, key_cols: list[str], rank_col: Column, tiebreak: list[Column | str]
) -> DataFrame:
    """W2: best row per key by an explicit priority rank (lower wins)."""
    w = Window.partitionBy(*key_cols).orderBy(rank_col, *tiebreak)
    return (
        df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")
    )


def stratified_sample(
    df: DataFrame, group_col: str, n_per_group: int, order_col: Column | str | None = None
) -> DataFrame:
    """W5: top-n per group under a deterministic pseudo-random order.

    The reference samples with a fixed seed (`Full_State_Sample_Generation.py:94`);
    the distributed equivalent orders by a hash of the row key so the sample
    is stable across partitionings and reruns.
    """
    order = order_col if order_col is not None else F.xxhash64(*df.columns)
    w = Window.partitionBy(group_col).orderBy(order)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n_per_group)
        .drop("_rn")
    )


def cluster_size(df: DataFrame, cluster_col: str = "cluster_id") -> DataFrame:
    """W1/A5: `Total_Parcels_Owned` analogue — per-cluster row count
    (`Name_Matching_opt.py:242`). groupBy + join back rather than a count
    window: the giant head cluster would otherwise be a single spilling
    window task (see refine_clusters_by_address). Cluster ids are non-null
    by construction (url-derived)."""
    counts = df.groupBy(cluster_col).agg(F.count(F.lit(1)).alias("cluster_size"))
    return df.join(counts, cluster_col).select(*df.columns, "cluster_size")
