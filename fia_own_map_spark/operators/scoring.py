"""Stage 2 — pairwise scoring inside blocks (north_star stage 2).

Reference parity mode (`score_mode="exact"`): the reference scores pairs by
*exact equality of phonetic keys* (`Name_Matching_opt.py:78` — sharing any
Meta_name key IS the match), so every candidate pair is an edge with score
1.0 and the scale path skips pair materialization entirely (star edges).

Similarity mode (`score_mode="similarity"`, the north-star extension): join
candidate pairs back to the normalized name strings and compute
  * Jaro-Winkler        — Arrow-batched pandas UDF
  * Levenshtein ratio   — built-in (JVM)
  * token-set Jaccard   — native array functions (JVM)

Scale design:
  * **Dedup-before-UDF**: mentions repeat heavily (that is why they block
    together), so scores are computed once per DISTINCT (name_a, name_b)
    pair and broadcast-joined back onto the id-pair table. Python work is
    bounded by distinct name pairs, not candidate pairs.
  * The distinct name-pair table is explicitly repartitioned to the session
    default parallelism before the UDF — AQE's partition coalescing targets
    shuffle *bytes* and would otherwise under-parallelize a CPU-bound Python
    stage (few MB of strings can cost minutes of CPU).
  * Single pass: no count() of the scored table; the candidate-pair count is
    taken from the cheap pre-UDF pair table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fia_own_map_spark.config import EngineConfig
from fia_own_map_spark.functions.similarity import similarity_scores


def score_pairs(
    pairs: DataFrame,
    records: DataFrame,
    id_col: str = "url",
    name_col: str = "simple_owners",
) -> DataFrame:
    """Attach jw / lev_ratio / jaccard scores to candidate pairs.

    Returns (id_a, id_b, jw, lev_ratio, jaccard).
    """
    spark = pairs.sparkSession
    names = records.select(F.col(id_col).alias("_id"), F.col(name_col).alias("_name"))
    with_names = (
        pairs.join(
            names.select(F.col("_id").alias("id_a"), F.col("_name").alias("name_a")), "id_a"
        ).join(
            names.select(F.col("_id").alias("id_b"), F.col("_name").alias("name_b")), "id_b"
        )
    )

    # score each distinct name pair exactly once (dedup-before-UDF), all three
    # measures in ONE fused Arrow round-trip (vectorized python kernel)
    parallelism = spark.sparkContext.defaultParallelism
    name_pairs = (
        with_names.select("name_a", "name_b")
        .distinct()
        .repartition(parallelism)
        .withColumn("_s", similarity_scores("name_a", "name_b"))
        .select("name_a", "name_b", "_s.jw", "_s.lev_ratio", "_s.jaccard")
    )
    # No broadcast hint: the distinct-name-pair table grows with candidate
    # diversity (unbounded at corpus scale) — let AQE pick broadcast vs
    # shuffle join from the measured size at runtime.
    return with_names.join(name_pairs, ["name_a", "name_b"]).select(
        "id_a", "id_b", "jw", "lev_ratio", "jaccard"
    )


def match_edges(scored: DataFrame, cfg: EngineConfig = EngineConfig()) -> DataFrame:
    """Threshold scored pairs into match edges (src, dst)."""
    keep = (
        (F.col("jw") >= cfg.jw_threshold)
        | (F.col("lev_ratio") >= cfg.lev_ratio_threshold)
        | (F.col("jaccard") >= cfg.jaccard_threshold)
    )
    return scored.filter(keep).select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    )
