"""Explicit-schema source readers (SURVEY.md §2.1 S1/S9).

The reference reads every stage input as CSV with explicit dtypes
(`Name_Matching_opt.py:138-146`) and small keyword/config CSVs
(`configs.py:62`). Engine rule: NEVER infer schemas on production paths —
inference costs an extra scan and silently changes types between runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

WEB_PAGES_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)

RECORDS_SCHEMA = (
    "url string, warc_ts timestamp, lang string, owner1 string, owner2 string,"
    " simple_owners string, tokens array<string>, name_keys array<string>,"
    " comb_addr string, initial_class int, own_type int, rule_matched boolean"
)


def read_web_pages(spark: SparkSession, path: str, fmt: str = "parquet") -> DataFrame:
    """Typed scan of the ER input table (BASELINE.json input_hint schema).

    On a production deployment this is `spark.read.table("catalog.db.web_pages")`
    (Iceberg — hidden partitioning + min/max pruning); here: explicit-schema
    parquet/csv/json file scans with identical downstream semantics.
    """
    reader = spark.read.schema(WEB_PAGES_SCHEMA)
    if fmt == "parquet":
        return reader.parquet(path)
    if fmt == "json":
        return reader.json(path)
    if fmt == "csv":
        # binary html cannot round-trip CSV; accept base64-encoded column
        csv_schema = WEB_PAGES_SCHEMA.replace("html binary", "html_b64 string")
        df = spark.read.schema(csv_schema).option("header", "true").csv(path)
        return df.withColumn("html", F.unbase64("html_b64")).drop("html_b64")
    raise ValueError(f"unsupported format: {fmt}")


def read_typed_csv(
    spark: SparkSession, path: str, schema: str | StructType, header: bool = True
) -> DataFrame:
    """S1: CSV scan with explicit dtypes — `pd.read_csv(dtype=...)` analogue."""
    return spark.read.schema(schema).option("header", str(header).lower()).csv(path)


def read_keyword_config(spark: SparkSession, path: str) -> dict[str, list[str]]:
    """S9: small keyword-family config CSV -> dict of lists (broadcastable).
    Shape of the reference's keywords.csv load (`configs.py:62-77`)."""
    pdf = spark.read.option("header", "true").csv(path).toPandas()
    return {c: pdf[c].dropna().tolist() for c in pdf.columns}
