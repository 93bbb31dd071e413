"""Name normalization (SURVEY.md §2.8 F1-F11).

Reproduces the reference's normalization semantics declaratively:

  1. upper-case concat of the two owner fields, null-safe
     (`Classify_Unknowns_opt.py:188` — ``(OWN1.fillna('')+' '+OWN2.fillna('')).str.upper()``)
  2. strip NameCleaner + biz_word_drop keywords, word-boundary, case-insensitive
     (`Classify_Unknowns_opt.py:175` + `utils/helpers.py:83-86` — note the
     reference strips whitespace off each keyword and does NOT regex-escape,
     so ``'DR. '`` becomes the pattern ``DR.``; replicated deliberately)
  3. expand common-name abbreviations (`Classify_Unknowns_opt.py:176` +
     `utils/helpers.py:89-92`)
  4. drop single-letter tokens (`Classify_Unknowns_opt.py:177`)
  5. NFKD -> ASCII fold, non-alphanumerics -> space, collapse, trim
     (`Classify_Unknowns_opt.py:159-163` ``normalize_unicode_to_ascii``)

Steps 1-4 are native Catalyst expressions (JVM-side, whole-stage codegen).
Step 5 needs Python's ``unicodedata`` — Arrow-batched pandas UDF; the same
pure function (``nfkd_ascii``) backs the pandas oracle in tests, so the
byte-identity invariant holds by construction.
"""

from __future__ import annotations

import re
import unicodedata

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

from fia_own_map_spark.config import BIZ_WORD_DROP, NAME_CLEANER, NAMES_EXPANDER

# ---------------------------------------------------------------------------
# Pure-Python reference semantics (shared with the test oracle)
# ---------------------------------------------------------------------------
_NON_ALNUM = re.compile(r"[^A-Za-z0-9 ]+")
_MULTISPACE = re.compile(r" +")


def nfkd_ascii(data: str) -> str:
    """Exact replica of `Classify_Unknowns_opt.py:159-163`."""
    val = unicodedata.normalize("NFKD", data).encode("ASCII", "ignore").decode("utf-8")
    val = _NON_ALNUM.sub(" ", val)
    val = _MULTISPACE.sub(" ", val)
    return val.strip()


def keyword_strip_pattern(words: list[str]) -> str:
    """`utils/helpers.py:83-86`: strip items, join with |, wrap in \\b...\\b.

    Items are deliberately NOT regex-escaped (reference behavior — ``DR.``
    matches ``DRX`` too). Case-insensitive via inline flag, which Java regex
    (Spark rlike/regexp_replace) and Python `re` both support.
    """
    joined = "|".join(v.strip() for v in words)
    return r"(?i)\b(?:" + joined + r")\b"


# ---------------------------------------------------------------------------
# Spark surface
# ---------------------------------------------------------------------------
@pandas_udf(StringType())
def _nfkd_ascii_udf(texts: pd.Series) -> pd.Series:
    return texts.map(lambda v: None if v is None else nfkd_ascii(v))


def nfkd_ascii_fold(col: Column | str) -> Column:
    """NFKD->ASCII fold + alnum-only + space collapse (pandas UDF, F3)."""
    return _nfkd_ascii_udf(F.col(col) if isinstance(col, str) else col)


def normalize_name(owner1: Column | str, owner2: Column | str | None = None) -> Column:
    """Full normalization chain producing the `Simple_Owners` analogue.

    All regex stages run JVM-side; only the NFKD fold crosses to Python.
    """
    c1 = F.col(owner1) if isinstance(owner1, str) else owner1
    combined = (
        F.concat_ws(
            " ",
            F.coalesce(c1, F.lit("")),
            F.coalesce(F.col(owner2) if isinstance(owner2, str) else owner2, F.lit("")),
        )
        if owner2 is not None
        else F.coalesce(c1, F.lit(""))
    )
    out = F.upper(combined)
    # 2. cleaner + biz-word strip (single alternation pass, compiled once per task)
    out = F.regexp_replace(out, keyword_strip_pattern(NAME_CLEANER + BIZ_WORD_DROP), "")
    # 3. abbreviation expansion (chained word-boundary replaces, JVM-side)
    for abbr, full in NAMES_EXPANDER.items():
        out = F.regexp_replace(out, r"\b" + abbr + r"\b", full)
    # 4. single-letter token drop (`Classify_Unknowns_opt.py:177`)
    out = F.regexp_replace(out, r"\b[a-zA-Z]\b", "")
    # 5. NFKD fold + alnum-only + collapse + trim (pandas UDF)
    return nfkd_ascii_fold(out)


def normalize_name_py(owner1: str | None, owner2: str | None = None) -> str:
    """Pure-Python oracle mirror of :func:`normalize_name` (used in tests)."""
    combined = " ".join(x for x in [(owner1 or ""), (owner2 or "")] if True).strip()
    if owner2 is None:
        combined = owner1 or ""
    out = combined.upper()
    pat = re.compile(keyword_strip_pattern(NAME_CLEANER + BIZ_WORD_DROP))
    out = pat.sub("", out)
    for abbr, full in NAMES_EXPANDER.items():
        out = re.sub(r"\b" + abbr + r"\b", full, out)
    out = re.sub(r"\b[a-zA-Z]\b", "", out)
    return nfkd_ascii(out)


def tokens_from_normalized(col: Column | str) -> Column:
    """`Simple_Owners.str.split(' ')` analogue; empty string -> empty array."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(F.length(c) > 0, F.split(c, " ")).otherwise(
        F.array().cast("array<string>")
    )


def combine_addr(
    num: Column | str, predir: Column | str, street: Column | str, mode: Column | str
) -> Column:
    """`Name_Matching_opt.py:131-132` — space-concat of four address parts
    with the literal ``'nan'+`` scrub quirk replicated deliberately (pandas
    str() of NaN produces 'nan'; the reference regex-drops runs of it).
    """
    cols = [F.col(x) if isinstance(x, str) else x for x in (num, predir, street, mode)]
    # str(NaN) == 'nan' in the reference; map null -> 'nan' then scrub.
    parts = [F.coalesce(c.cast("string"), F.lit("nan")) for c in cols]
    raw = F.concat_ws(" ", *parts)
    return F.regexp_replace(raw, "nan+", "")
