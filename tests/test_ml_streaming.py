"""ML residual classifier + incremental (streaming-shaped) ER ingest."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from fia_own_map_spark.config import EngineConfig
from fia_own_map_spark.operators.ml import (
    predict_residual,
    preprocess_simple_owner_py,
    train_residual_classifier,
)
from fia_own_map_spark.plans.pipeline import run_pipeline
from fia_own_map_spark.sources.checkpoint import CheckpointStore
from fia_own_map_spark.streaming.ingest import IncrementalER


def test_stemmer_semantics():
    assert preprocess_simple_owner_py("Running Faster!") == "runn fast"
    assert preprocess_simple_owner_py("HOLDINGS, PROPERTIES") == "hold properti"
    assert preprocess_simple_owner_py("") == ""
    # deterministic + idempotent on already-stemmed text
    assert preprocess_simple_owner_py("hold properti") == preprocess_simple_owner_py(
        "hold properti"
    )


def test_residual_classifier_roundtrip(spark):
    # two separable classes by vocabulary
    corp_stems = ["CASCADE", "PINNACLE", "GRANITE", "SUMMIT", "HARBOR", "STERLING"]
    corp_sufs = ["TIMBER HOLDINGS", "LUMBER CO", "PROPERTIES", "INVESTMENTS"]
    given = ["JOHN", "MARY", "ROBERT", "LINDA", "JAMES", "SUSAN"]
    sur = ["SMITH", "JONES", "MILLER", "DAVIS", "WILSON", "TAYLOR"]
    rows = []
    for a in corp_stems:
        for b in corp_sufs:
            rows.append((f"{a} {b}", 41))
    for g in given:
        for s in sur:
            rows.append((f"{g} {s} FAMILY", 45))
    pdf = pd.DataFrame(rows, columns=["simple_owners", "own_type"])
    sdf = spark.createDataFrame(pdf)
    model, labels, metrics = train_residual_classifier(sdf)
    assert metrics["holdout_accuracy"] >= 0.9, metrics
    test = spark.createDataFrame(
        pd.DataFrame(
            {"simple_owners": ["PINNACLE TIMBER HOLDINGS", "MARY SMITH FAMILY"]}
        )
    )
    got = predict_residual(model, labels, test).select("own_type_pred").toPandas()
    assert got["own_type_pred"].tolist() == [41, 45]


@pytest.mark.slow
def test_incremental_ingest_matches_batch(spark, tmp_path):
    """Two micro-batches must produce the same partition as one batch run."""
    from fia_own_map_spark.sources.webpages import generate_web_pages

    pages, _ = generate_web_pages(n_pages=600, seed=21)
    half = len(pages) // 2
    b1, b2 = pages.iloc[:half], pages.iloc[half:]

    inc = IncrementalER(spark, str(tmp_path / "state"))
    inc.process_batch(spark.createDataFrame(b1), 0)
    labels_inc = inc.process_batch(spark.createDataFrame(b2), 1).toPandas()

    store = CheckpointStore(str(tmp_path / "batch"), "full")
    clusters, _ = run_pipeline(spark, spark.createDataFrame(pages), EngineConfig(), checkpoints=store)
    labels_batch = clusters.select("url", "cluster_id").toPandas()

    def sig(df):
        return {frozenset(g) for _, g in df.groupby("cluster_id")["url"]}

    assert sig(labels_inc) == sig(labels_batch)
