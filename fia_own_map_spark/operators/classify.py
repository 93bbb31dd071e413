"""Ownership classification — initial-class ladder + rule cascade (SURVEY.md
§2.8 F15, §2.9 M4).

The reference's ~20-step keyword cascade (`Classify_Unknowns_opt.py:246-661`)
splits the table into buckets with repeated regex filters and re-concats. The
bucket *order* is the semantics (each record takes the first bucket that
claims it), so the Spark rebuild is a single pass of prioritized CASE
expressions over class-indicator predicates — one whole-stage-codegen'd
projection instead of ~40 filter+union scans.

The initial-class ladder (`Classify_Unknowns_opt.py:132-156`) is a sequence
of pandas ``.loc`` overwrites — later writes win — so the CASE branches here
are that ladder in *reverse* priority order.

The residual bucket (records no rule claims) goes to the RF model in the
reference (`Classify_Unknowns_opt.py:531-555`, 20-tree TF-IDF forest); the
capability-parity ML path lives in `operators/ml.py`; the pure-rule cascade
assigns the reference's majority fallback (family, 45) and flags the row via
``rule_matched = false`` so the ML stage can re-score exactly that slice.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from fia_own_map_spark.config import (
    CLASS_CORPORATE,
    CLASS_FAMILY,
    CLASS_FEDERAL,
    CLASS_LOCAL,
    CLASS_OTHER_CORP_42,
    CLASS_OTHER_CORP_43,
    CLASS_STATE,
    CLASS_UNKNOWN,
    CORP_ACRONYMS,
    CORP_KEYWORDS,
    CORPORATE_INDICATOR_KEYWORDS,
    FEDERAL_KEYWORDS,
    JUNIOR_KEYWORDS,
    KW42,
    KW43,
    REL_KEYWORDS,
    TRUST_KEYWORDS,
    UNAVAILABLE_KEYWORDS,
)
from fia_own_map_spark.functions.normalize import keyword_strip_pattern


def _contains_any(col: Column, words: list[str]) -> Column:
    """Word-boundary any-keyword predicate (`utils/helpers.py:83-86` shape)."""
    return col.rlike(keyword_strip_pattern(words))


def _contains_substr_any(col: Column, words: list[str]) -> Column:
    """Plain substring match, case-insensitive (`Classify_Unknowns_opt.py:399-407`)."""
    lowered = F.lower(col)
    pred = F.lit(False)
    for w in words:
        pred = pred | lowered.contains(w.lower())
    return pred


def acronym_variants_pattern(acronyms: list[str] = CORP_ACRONYMS) -> str:
    """`Classify_Unknowns_opt.py:362-370`: exact \\bACR\\b plus the
    spaced/dotted variant (L\\s*\\.?\\s*L\\s*\\.?\\s*C)."""
    pats = []
    for acr in acronyms:
        pats.append(rf"\b{acr}\b")
        pats.append(r"\b" + r"\s*\.?\s*".join(list(acr)) + r"\b")
    return "(?i)(?:" + "|".join(pats) + ")"


def initial_class(own1: Column | str, own2: Column | str) -> Column:
    """F15 ladder, encoded with reverse-priority CASE precedence.

    Reference order of overwrites (`Classify_Unknowns_opt.py:141-156`):
    default 10 -> nulls -> word-count rules -> juniors -> corporate;
    the -99999 sentinel is folded to 1 afterwards (`:206`).
    """
    c1 = F.col(own1) if isinstance(own1, str) else own1
    c2 = F.col(own2) if isinstance(own2, str) else own2
    nan1, nan2 = c1.isNull(), c2.isNull()
    # pandas: len(fillna('').split()) — null -> 0 words
    len1 = F.size(F.split(F.trim(F.coalesce(c1, F.lit(""))), r"\s+")) - F.when(
        F.length(F.trim(F.coalesce(c1, F.lit("")))) == 0, F.lit(1)
    ).otherwise(F.lit(0))
    corp = _contains_any(F.coalesce(c1, F.lit("")), CORPORATE_INDICATOR_KEYWORDS) | _contains_any(
        F.coalesce(c2, F.lit("")), CORPORATE_INDICATOR_KEYWORDS
    )
    juniors = _contains_any(F.coalesce(c1, F.lit("")), JUNIOR_KEYWORDS) | _contains_any(
        F.coalesce(c2, F.lit("")), JUNIOR_KEYWORDS
    )
    non_std = len1 == 1
    return (
        F.when(corp, F.lit(0))
        .when(juniors, F.lit(3))
        .when(len1 > 1, F.lit(1))
        .when(non_std & nan2, F.lit(0))
        .when(non_std & ~nan2, F.lit(1))
        .when(nan1 & nan2, F.lit(2))
        .when(nan1 & ~nan2, F.lit(1))  # -99999 sentinel, folded to 1 (:206)
        .otherwise(F.lit(10))
    )


# Gov-cascade keyword groups (Classify_Unknowns_opt.py:425-657). The federal /
# local / state regex ladders are inline in the reference; the state name is a
# deployment parameter there (`:635`) and a config arg here.
_USA_VARIATIONS = r"(?i)\b(U(\s*\.?\s*)S(\s*\.?\s*)A(\s*\.?\s*)?)\b"
_GOV_KEYWORDS = [
    r"UNIVERSITY", r"STATE UNIVERSITY", r"COMMUNITY COLLEGE", r"STATE COLLEGE",
    r"U\.?S\.?A?", r"FEDERAL", r"CONSERVATION", r"GOVT",
    r"DEPARTMENT OF (AGRICULTURE|INTERIOR|DEFENSE|ENERGY|EDUCATION|TRANSPORTATION|JUSTICE|LABOR|COMMERCE)",
    r"BUREAU OF", r"USDA", r"FOREST SERVICE", r"EPA", r"DHS", r"FBI", r"DOI",
    r"USFS", r"FWS", r"USFWS", r"DOT", r"USDI", r"USACE", r"NOAA", r"NPS",
    r"DOD", r"BLM", r"DOE", r"BIA", r"INTR", r"B\s*L\s*M", r"GOVERNMENT",
    r"COMMONWEALTH", r"NATURAL RESOURCES",
]
_LOCAL_GOV_PRE = [
    "city of", "town of", "village of", "the city of", "the town of",
    "city", "town", "municipal", "school district",
]
_FEDERAL_PATTERNS = [
    r"U\.?S\.?A?", r"U\s*\.?\s*S\s*\.?\s*A?\s*\.?", r"FEDERAL", r"GOVT",
    r"UNITED STATES", r"DEPARTMENT OF (AGRICULTURE|INTERIOR|DEFENSE|ENERGY|EDUCATION|JUSTICE|LABOR|COMMERCE)",
    r"BUREAU OF", r"USDA", r"FOREST SERVICE", r"EPA", r"DHS", r"FBI", r"DOI",
    r"USFS", r"FWS", r"USFWS", r"USDI", r"USACE", r"NOAA", r"NPS", r"DOD",
    r"BLM", r"DOE", r"BIA", r"INTR", r"B\s*L\s*M", r"AMERICA",
]
_LOCAL_PATTERNS = [
    r"CITY", r"TOWN", r"VILLAGE", r"COUNTY", r"PARISH", r"BOROUGH",
    r"COMMUNITY COLLEGE", r"MUNICIPAL", r"SCHOOL DISTRICT", r"FIRE DISTRICT",
    r"POLICE DEPARTMENT", r"IRRIGATION", r"SEWER", r"DRAINAGE", r"SANITATION",
]
_STATE_PATTERNS = [
    r"STATE\b.*\b(DEPARTMENT|DEPT|UNIVERSITY|COLLEGE|OFFICE|AGENCY|AUTHORITY|SCHOOL|EDUCATION|COMMISSION)",
    r"COMMONWEALTH", r"STATE OF", r"STATE \w+ DEPT", r"DEPARTMENT", r"DEPT",
    r"STATE", r"DOT", r"DEPARTMENT OF (TRANSPORTATION)",
]


def _rx(words: list[str]) -> str:
    return r"(?i)\b(?:" + "|".join(words) + r")\b"


def classify_own_type(
    df: DataFrame,
    own1: str = "owner1",
    own2: str = "owner2",
    initial_class_col: str = "initial_class",
    state_name: str | None = None,
    out_col: str = "own_type",
) -> DataFrame:
    """Single-pass prioritized CASE over the cascade's bucket order
    (`Classify_Unknowns_opt.py:246-661` — trusts -> farms -> 42 -> religious
    -> 43 (minus GOLF/WORLDMARK) -> USA/gov (minus corp-like) -> family ->
    corp -> residual; then gov subclassification federal -> local -> state ->
    leftover local).

    Note on codegen: this CASE is large enough that whole-stage codegen of
    the stage containing it exceeds the JVM's 64 KB method limit; Spark logs
    an InternalCompilerException and falls back to interpreted evaluation
    for that stage (spark.sql.codegen.fallback, on by default). That is the
    intended behavior, not an error: the stage's cost is dominated by the
    java.util.regex matching itself, which is identical compiled or
    interpreted, so splitting the cascade into codegen-sized pieces would
    add projection barriers without measurable gain."""
    c1 = F.coalesce(F.col(own1), F.lit(""))
    c2 = F.coalesce(F.col(own2), F.lit(""))
    both = F.concat_ws(" ", c1, c2)
    ic = F.col(initial_class_col)

    unavailable = F.col(own1).isin(UNAVAILABLE_KEYWORDS) | F.col(own2).isin(
        UNAVAILABLE_KEYWORDS
    )
    is_trust = _contains_substr_any(both, [" trust ", " rev tr of "]) | both.rlike(
        r"(?i)\bTRUST\b"
    )
    family_trust = is_trust & _contains_substr_any(both, TRUST_KEYWORDS)
    trust43 = is_trust & ~family_trust & _contains_any(both, KW43)
    is_farm = both.rlike(r"(?i)farms")
    family_farm = is_farm & _contains_substr_any(
        both, [" family ", " brother ", " son ", " daughter "]
    )
    is42 = _contains_any(both, KW42)
    religious = _contains_any(both, REL_KEYWORDS)
    is43 = _contains_any(both, KW43) & ~both.rlike(r"(?i)\b(?:GOLF|WORLDMARK)\b")

    corp_like = c1.rlike(_rx(CORP_KEYWORDS + ["COMPANY", "INSURANCE", "BANK", "MORTGAGE",
                                              "SAVINGS", "FINANCIAL", "ASSOCIATION",
                                              "COOPERATIVE", "HOUSING AUTHORITY"])) | c1.rlike(
        acronym_variants_pattern()
    )
    corp_like_both = corp_like | c2.rlike(_rx(CORP_KEYWORDS)) | c2.rlike(
        acronym_variants_pattern()
    )
    maybe_usa = c1.rlike(_USA_VARIATIONS) | c2.rlike(_USA_VARIATIONS)
    early_local = _contains_substr_any(both, _LOCAL_GOV_PRE)
    gov_kw = _contains_any(both, _GOV_KEYWORDS)
    is_gov = (maybe_usa & ~corp_like_both) | early_local | (gov_kw & ~corp_like)

    is_corp = _contains_any(both, CORP_KEYWORDS) | both.rlike(acronym_variants_pattern())

    # gov subclassification (reference :584-661)
    fed = _contains_any(both, _FEDERAL_PATTERNS + FEDERAL_KEYWORDS)
    local = _contains_any(both, _LOCAL_PATTERNS)
    state_pats = list(_STATE_PATTERNS)
    if state_name:
        state_pats.append(state_name.upper())
    state = _contains_any(both, state_pats)
    gov_code = (
        F.when(fed, F.lit(CLASS_FEDERAL))
        .when(local, F.lit(CLASS_LOCAL))
        .when(state, F.lit(CLASS_STATE))
        .otherwise(F.lit(CLASS_LOCAL))
    )

    own_type = (
        F.when(unavailable | (ic == 2), F.lit(CLASS_UNKNOWN))
        .when(family_trust, F.lit(CLASS_FAMILY))
        .when(trust43, F.lit(CLASS_OTHER_CORP_43))
        .when(family_farm, F.lit(CLASS_FAMILY))
        .when(is42, F.lit(CLASS_OTHER_CORP_42))
        .when(religious, F.lit(CLASS_OTHER_CORP_43))
        .when(is43, F.lit(CLASS_OTHER_CORP_43))
        .when(is_gov, gov_code)
        .when(ic == 1, F.lit(CLASS_FAMILY))
        .when(ic == 3, F.lit(CLASS_FAMILY))
        .when(is_corp, F.lit(CLASS_CORPORATE))
        .otherwise(F.lit(CLASS_FAMILY))  # residual: ML re-scores (rule_matched=false)
    )
    rule_matched = (
        unavailable | (ic == 2) | family_trust | trust43 | family_farm | is42
        | religious | is43 | is_gov | (ic == 1) | (ic == 3) | is_corp
    )
    return df.withColumn(out_col, own_type).withColumn("rule_matched", rule_matched)


def with_initial_class(
    df: DataFrame, own1: str = "owner1", own2: str = "owner2", out_col: str = "initial_class"
) -> DataFrame:
    return df.withColumn(out_col, initial_class(own1, own2))
