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
and keep pairs passing any threshold. Both name joins are plain equi-joins
on id; the pair table is the big side, the records side carries only
(id, simple_owners, tokens).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fia_own_map_spark.config import EngineConfig
from fia_own_map_spark.functions.similarity import (
    jaro_winkler_sim,
    levenshtein_ratio,
    token_set_jaccard,
)


def score_pairs(
    pairs: DataFrame,
    records: DataFrame,
    id_col: str = "url",
    name_col: str = "simple_owners",
    tokens_col: str = "tokens",
) -> DataFrame:
    """Attach jw / lev_ratio / jaccard scores to candidate pairs."""
    names = records.select(
        F.col(id_col).alias("_id"),
        F.col(name_col).alias("_name"),
        F.col(tokens_col).alias("_tokens"),
    )
    scored = (
        pairs.join(
            names.select(
                F.col("_id").alias("id_a"),
                F.col("_name").alias("name_a"),
                F.col("_tokens").alias("tokens_a"),
            ),
            "id_a",
        )
        .join(
            names.select(
                F.col("_id").alias("id_b"),
                F.col("_name").alias("name_b"),
                F.col("_tokens").alias("tokens_b"),
            ),
            "id_b",
        )
        .withColumn("jw", jaro_winkler_sim("name_a", "name_b"))
        .withColumn("lev_ratio", levenshtein_ratio("name_a", "name_b"))
        .withColumn("jaccard", token_set_jaccard("tokens_a", "tokens_b"))
    )
    return scored.select("id_a", "id_b", "jw", "lev_ratio", "jaccard")


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
