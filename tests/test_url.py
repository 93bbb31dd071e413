"""URL feature functions (fia_own_map_spark/functions/url.py).

Edge cases beyond what the driver contract exercises: default ports,
fragments without query, multi-label public suffixes, bare hosts,
tracking-param stripping when every param is tracking."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from fia_own_map_spark.functions import url as U


CASES = [
    # (url, host, reg_domain, path_depth, id_param, clean_url)
    ("https://www.Example.COM/a/b?id=7&utm_source=x",
     "www.example.com", "example.com", 2, "7", "https://www.Example.COM/a/b?id=7"),
    ("http://sub.shop.co.uk:8080/x/y/z/?q=1#frag",
     "sub.shop.co.uk", "shop.co.uk", 3, None, "http://sub.shop.co.uk:8080/x/y/z/?q=1"),
    ("https://host.org#only-frag",
     "host.org", "host.org", 0, None, "https://host.org"),
    ("https://a.b.c.com.au/p?utm_source=x&utm_medium=y",
     "a.b.c.com.au", "c.com.au", 1, None, "https://a.b.c.com.au/p"),
    ("https://localhost/admin?id=1",
     "localhost", "localhost", 1, "1", "https://localhost/admin?id=1"),
]


@pytest.fixture(scope="module")
def feats(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"i": range(len(CASES)), "url": [c[0] for c in CASES]})
    )
    out = (
        U.with_url_features(df)
        .withColumn("id_param", U.url_query_param("url", "id"))
        .withColumn("clean_url", U.strip_tracking_params("url"))
        .orderBy("i")
        .collect()
    )
    return out


def test_url_host_and_domain(feats):
    for row, (_, host, dom, _, _, _) in zip(feats, CASES):
        assert row["host"] == host, row["url"]
        assert row["reg_domain"] == dom, row["url"]


def test_url_path_depth(feats):
    for row, (_, _, _, depth, _, _) in zip(feats, CASES):
        assert row["path_depth"] == depth, row["url"]


def test_url_params_and_strip(feats):
    for row, (_, _, _, _, idp, clean) in zip(feats, CASES):
        assert row["id_param"] == idp, row["url"]
        assert row["clean_url"] == clean, row["url"]


def test_url_plan_is_native(spark):
    """The whole URL feature block must stay inside codegen — no
    BatchEvalPython / ArrowEvalPython nodes (100 TB hot path)."""
    df = spark.createDataFrame(pd.DataFrame({"url": ["https://a.com/x"]}))
    plan = (
        U.with_url_features(df)
        .withColumn("clean", U.strip_tracking_params("url"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "EvalPython" not in plan
