"""Eval-set decontamination — the n-gram overlap screen every serious
pretraining pipeline runs before training (the public method: GPT-3's
13-gram dedup against benchmarks, Brown et al. 2020 Appendix C; PaLM and
The Pile use the same shape): flag/remove training documents that share
any k-token shingle with a held-out evaluation set, so benchmark numbers
measure generalization rather than memorization.

Scale design (the part that matters at 100 TB):

  * the EVAL side is tiny relative to the corpus (benchmarks are
    thousands of docs, the corpus is billions) — its DISTINCT shingle-key
    set is built once and the train side probes it with an equi-join that
    AQE turns into a broadcast when it fits (and a shuffled hash join when
    it does not; either way never a cartesian);
  * shingle keys are 8-byte xxhash64 of the k-gram text (same trick as
    span dedup: the shuffle/broadcast moves longs, not strings); a 64-bit
    collision can only FLAG an extra doc, never miss one — the
    conservative direction for decontamination;
  * per-doc accounting (how many shingle hits / how many distinct eval
    docs hit) is one groupBy over the join output; removal is a left-anti
    join — no window anywhere, no Python anywhere.

Composition note: run decontamination AFTER exact/near dedup (fewer rows
to shingle) and BEFORE quality filtering (a contaminated doc should not
survive just because it reads well).

Parity: `contamination_py` is the clean-room single-machine mirror;
the driver-contract oracle (`decontam_eval_overlap`) rebuilds the screen
in DuckDB SQL over the string shingles (identical result absent a 64-bit
collision within the contract corpus).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fia_own_map_spark.operators.dedup import (
    _positioned_shingles,
    normalized_words_py,
)


def _shingle_keys(
    df: DataFrame, id_col: str, text_col: str, k: int, hash_shingles: bool
) -> DataFrame:
    """(id, _sk) — one row per DISTINCT shingle per document."""
    sh = F.explode(_positioned_shingles(text_col, k)).alias("shingle")
    keyed = df.select(F.col(id_col), sh).select(
        id_col,
        (F.xxhash64("shingle") if hash_shingles else F.col("shingle")).alias(
            "_sk"
        ),
    )
    return keyed.distinct()


def contamination_report(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    hash_shingles: bool = True,
) -> DataFrame:
    """Every TRAIN row scored against the eval set: (id, n_shared_shingles
    [distinct shingles of this doc seen anywhere in eval], n_eval_docs_hit
    [distinct eval docs sharing at least one shingle], contaminated).
    Clean and too-short docs report zeros."""
    train_sh = _shingle_keys(train, id_col, text_col, k, hash_shingles)
    eval_sh = _shingle_keys(eval_df, id_col, text_col, k, hash_shingles).select(
        F.col(id_col).alias("_eval_id"), "_sk"
    )
    hits = train_sh.join(eval_sh, "_sk")
    per_doc = hits.groupBy(id_col).agg(
        F.countDistinct("_sk").alias("n_shared_shingles"),
        F.countDistinct("_eval_id").alias("n_eval_docs_hit"),
    )
    return (
        train.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_shared_shingles", F.lit(0)).alias("n_shared_shingles"),
            F.coalesce("n_eval_docs_hit", F.lit(0)).alias("n_eval_docs_hit"),
            F.coalesce(F.col("n_shared_shingles") > 0, F.lit(False)).alias(
                "contaminated"
            ),
        )
    )


def decontaminate(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    hash_shingles: bool = True,
) -> DataFrame:
    """Training rows with NO k-gram overlap with the eval set (left-anti
    join against the contaminated id set — one shuffle-free probe of the
    eval shingle keys plus the anti join)."""
    train_sh = _shingle_keys(train, id_col, text_col, k, hash_shingles)
    eval_sh = _shingle_keys(eval_df, id_col, text_col, k, hash_shingles).select(
        "_sk"
    ).distinct()
    dirty = train_sh.join(eval_sh, "_sk", "left_semi").select(id_col).distinct()
    return train.join(dirty, id_col, "left_anti")


# ---------------------------------------------------------------------------
# clean-room single-machine mirror (testing convention of this repo)
# ---------------------------------------------------------------------------
def _shingle_set_py(text: str | None, k: int) -> set[str]:
    words = normalized_words_py(text) if text is not None else []
    return {
        " ".join(words[i : i + k]) for i in range(len(words) - k + 1)
    }


def contamination_py(
    train: dict[int, str | None], eval_docs: dict[int, str | None], k: int = 8
) -> dict[int, tuple[int, int, bool]]:
    """{train_id: (n_shared_shingles, n_eval_docs_hit, contaminated)}."""
    eval_sets = {i: _shingle_set_py(t, k) for i, t in eval_docs.items()}
    out: dict[int, tuple[int, int, bool]] = {}
    for i, t in train.items():
        sh = _shingle_set_py(t, k)
        shared: set[str] = set()
        docs_hit = 0
        for _, es in eval_sets.items():
            inter = sh & es
            if inter:
                shared |= inter
                docs_hit += 1
        out[i] = (len(shared), docs_hit, bool(shared))
    return out
