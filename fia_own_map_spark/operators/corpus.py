"""One-call training-corpus cleaning pipeline — the composition artifact.

The individual operators (exact dedup, duplicated-span removal, quality
scoring, language ID, BPE token accounting) each ship with their own
oracles; this module chains them in the order a production pretraining
pipeline runs them and accounts for what every stage dropped:

    exact dedup -> duplicated-span removal -> quality filter ->
    language filter -> token accounting

Design: the whole chain stays ONE lazy DataFrame plan (Catalyst fuses the
filters; nothing materializes until the caller acts), and the per-stage
metrics are a SINGLE aggregate job over a one-pass stage-tag column rather
than one count() action per stage — at 100 TB, five counts would be five
full scans; the tag costs one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fia_own_map_spark.operators.dedup import (
    exact_keep_ids,
    normalized_text,
    remove_duplicated_spans,
)
from fia_own_map_spark.operators.text import lang_id, quality_features, token_count_ws

# stage tags, in pipeline order (a row carries the FIRST stage that drops it)
DROP_EXACT_DUP = "exact_dup"
DROP_EMPTY = "empty"          # NULL text, or span removal consumed everything
DROP_QUALITY = "low_quality"
DROP_LANG = "lang"
KEPT = "kept"


def tag_corpus(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    span_k: int = 8,
    span_min_count: int = 2,
    min_quality: float = 0.25,
    lang_allow: tuple[str, ...] = ("en",),
) -> DataFrame:
    """Every input row, tagged with its pipeline outcome. Emitted columns:
    all input columns + clean_text (span-removed normalized text),
    n_tokens_clean (post-clean whitespace count), n_tokens_removed_spans
    (the span stage's per-row excision budget), quality_score, lang_pred,
    drop_stage — plus quality_features' own diagnostics (n_tokens over
    clean_text, punct/stopword ratios). Downstream selects should use
    n_tokens_clean / lang_pred, not the quality-diagnostic n_tokens."""
    # survivors = semi-join against the keep-id aggregate, dups = the anti
    # complement: one groupBy + one join per branch, where the previous
    # _is_dup route joined the full (id, canonical_id) map back to every row
    # first (one more full-table exchange per branch for the same split).
    keep = exact_keep_ids(df, id_col, text_col)
    # STAGE ORDER MATTERS: span removal must see the DEDUPED corpus — on the
    # raw corpus two identical documents make every shingle a corpus-level
    # duplicate and annihilate each other's entire text (the Lee-et-al
    # removal drops ALL occurrences); after exact dedup the surviving copy's
    # spans are only the genuinely-repeated passages.
    survivors = df.join(keep, id_col, "left_semi")
    cleaned = remove_duplicated_spans(
        survivors, id_col, text_col, out_col="clean_text",
        k=span_k, min_count=span_min_count,
    )
    scored = quality_features(cleaned, text_col="clean_text").withColumn(
        "lang_pred", lang_id("clean_text")
    )
    empty = F.col("clean_text").isNull() | (F.length(F.trim("clean_text")) == 0)
    drop = (
        F.when(empty, F.lit(DROP_EMPTY))
        .when(F.col("quality_score") < min_quality, F.lit(DROP_QUALITY))
        .when(~F.col("lang_pred").isin(*lang_allow), F.lit(DROP_LANG))
        .otherwise(F.lit(KEPT))
    )
    surv_tagged = (
        scored.withColumn(
            "n_tokens_clean",
            F.when(F.col("clean_text").isNull(), F.lit(0))
            .otherwise(token_count_ws("clean_text")),
        )
        # span-removal budget, closed per row: pre-removal token count of
        # the SAME normalization minus what survived (span_dedup_stats is
        # the standalone detect-and-budget view of the identical quantity)
        .withColumn(
            "n_tokens_removed_spans",
            F.greatest(
                F.when(F.col(text_col).isNull(), F.lit(0)).otherwise(
                    token_count_ws(normalized_text(text_col))
                )
                - F.col("n_tokens_clean"),
                F.lit(0),
            ),
        )
        .withColumn("drop_stage", drop)
    )
    dup_tagged = (
        df.join(keep, id_col, "left_anti")
        .withColumn("clean_text", F.lit(None).cast("string"))
        .withColumn("n_tokens_clean", F.lit(0))
        .withColumn("n_tokens_removed_spans", F.lit(0))
        .withColumn("drop_stage", F.lit(DROP_EXACT_DUP))
    )
    return surv_tagged.unionByName(dup_tagged, allowMissingColumns=True)


def clean_training_corpus(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    **kwargs,
) -> DataFrame:
    """The surviving documents only: (id, clean_text, n_tokens_clean,
    quality_score, lang_pred). Stays lazy; Catalyst fuses every filter."""
    tagged = tag_corpus(df, id_col, text_col, **kwargs)
    return tagged.filter(F.col("drop_stage") == KEPT).select(
        id_col, "clean_text", "n_tokens_clean", "quality_score", "lang_pred"
    )


def corpus_metrics(tagged: DataFrame) -> dict[str, dict[str, int]]:
    """{stage: {docs, tokens, span_tokens_removed}} in ONE aggregate job
    over the tag column (never one count() per stage). Tokens are post-
    span-removal counts, so kept-tokens is the actual training-data volume
    the pipeline yields; span_tokens_removed closes the loop on the
    "budget before you remove" story span_dedup_stats starts — how many
    tokens the span stage excised from each outcome group (0 for exact
    dups, which never reach it)."""
    rows = (
        tagged.groupBy("drop_stage")
        .agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum("n_tokens_clean").alias("tokens"),
            F.sum("n_tokens_removed_spans").alias("span_removed"),
        )
        .collect()
    )
    out = {
        s: {"docs": 0, "tokens": 0, "span_tokens_removed": 0}
        for s in (DROP_EXACT_DUP, DROP_EMPTY, DROP_QUALITY, DROP_LANG, KEPT)
    }
    for r in rows:
        out[r["drop_stage"]] = {
            "docs": r["docs"],
            "tokens": int(r["tokens"] or 0),
            "span_tokens_removed": int(r["span_removed"] or 0),
        }
    return out
