"""Stage-0 invariant: byte-identical extracted text per url (BASELINE.json)."""

import hashlib

from pyspark.sql import functions as F

from fia_own_map_spark.operators.extract import extract_text_py, parse_mentions, with_extracted_text
from fia_own_map_spark.sources.webpages import generate_web_pages


def test_extract_byte_identity_py():
    pages, _ = generate_web_pages(n_pages=300, seed=7)
    for html, text in zip(pages["html"], pages["text"]):
        got = extract_text_py(html)
        assert got == text
        assert hashlib.sha256(got.encode()).digest() == hashlib.sha256(text.encode()).digest()


def test_extract_byte_identity_spark(spark, tiny_pages):
    pages, _ = tiny_pages
    sdf = spark.createDataFrame(pages)
    out = with_extracted_text(sdf.drop("text"), "html", "text")
    mism = (
        out.join(spark.createDataFrame(pages[["url", "text"]]).withColumnRenamed("text", "golden"), "url")
        .filter(F.sha2(F.col("text"), 256) != F.sha2(F.col("golden"), 256))
        .count()
    )
    assert mism == 0


def test_parse_mentions(spark, tiny_pages):
    pages, truth = tiny_pages
    sdf = spark.createDataFrame(pages)
    parsed = parse_mentions(sdf, "text").select("url", "owner1", "owner2").toPandas()
    merged = parsed.merge(truth[["url", "owner1_mention", "owner2_mention"]], on="url")
    assert (merged["owner1"].fillna("") == merged["owner1_mention"].fillna("")).all()
    assert (merged["owner2"].fillna("") == merged["owner2_mention"].fillna("")).all()
