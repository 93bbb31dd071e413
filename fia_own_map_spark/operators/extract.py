"""Stage 0 — html -> text extraction (byte-identical per url).

The per-row invariant (BASELINE.json `input_hint`): extracted `text` must be
byte-identical per `url`. The extractor is a pure function over the html
bytes: decode utf-8, pull <p>...</p> contents in document order, unescape
HTML entities, join with '\\n'. It is deliberately dependency-free (no bs4 in
this environment) and deterministic; the same function backs the pandas
oracle so `sha256(extract(html)) == sha256(text)` is testable row-by-row.

Spark surface is an Arrow-batched pandas UDF (binary -> string). Also
provides owner/entity mention parsing out of the extracted text — pure
`regexp_extract`, JVM-side.
"""

from __future__ import annotations

import html as html_mod
import re

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

_P_TAG = re.compile(rb"<p>(.*?)</p>", re.DOTALL)


def extract_text_py(html_bytes: bytes | None) -> str | None:
    """Pure extraction function — the single source of truth for stage 0."""
    if html_bytes is None:
        return None
    paragraphs = _P_TAG.findall(html_bytes)
    return "\n".join(html_mod.unescape(p.decode("utf-8", errors="strict")) for p in paragraphs)


@pandas_udf(StringType())
def _extract_udf(html_col: pd.Series) -> pd.Series:
    return html_col.map(extract_text_py)


def extract_text(col: Column | str) -> Column:
    return _extract_udf(F.col(col) if isinstance(col, str) else col)


def with_extracted_text(df: DataFrame, html_col: str = "html", out_col: str = "text") -> DataFrame:
    return df.withColumn(out_col, extract_text(html_col))


# ---------------------------------------------------------------------------
# Mention parsing — JVM-side regexp over the extracted text.
# Field layout mirrors the generator/reference analogue mapping (SURVEY.md §7.2):
# OWNER: -> OWN1, CO-OWNER: -> OWN2, ADDRESS: -> MHSNUMB/MPREDIR/MSTNAME/MMODE.
# ---------------------------------------------------------------------------
def parse_mentions(df: DataFrame, text_col: str = "text") -> DataFrame:
    t = F.col(text_col)

    def line(prefix: str) -> Column:
        raw = F.regexp_extract(t, rf"(?m)^{prefix}: (.*)$", 1)
        return F.nullif(F.trim(raw), F.lit(""))

    return (
        df.withColumn("owner1", line("OWNER"))
        .withColumn("owner2", line("CO-OWNER"))
        .withColumn("care_of", line("CARE OF"))
        .withColumn("addr_num", F.nullif(F.regexp_extract(t, r"(?m)^ADDRESS: (\S+)", 1), F.lit("")))
        .withColumn(
            "addr_predir",
            F.nullif(F.regexp_extract(t, r"(?m)^ADDRESS: \S+ (\S+) \S+ \S+$", 1), F.lit("")),
        )
        .withColumn(
            "addr_street",
            F.nullif(F.regexp_extract(t, r"(?m)^ADDRESS: \S+ \S+ (\S+) \S+$", 1), F.lit("")),
        )
        .withColumn(
            "addr_mode",
            F.nullif(F.regexp_extract(t, r"(?m)^ADDRESS: \S+ \S+ \S+ (\S+)$", 1), F.lit("")),
        )
        .withColumn("region", line("REGION"))
    )
