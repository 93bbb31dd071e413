"""Stage-2 scoring: similarity measures + similarity-mode pipeline."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from fia_own_map_spark.config import EngineConfig
from fia_own_map_spark.functions.similarity import (
    jaro_winkler,
    jaro_winkler_sim,
    levenshtein_ratio,
    levenshtein_ratio_py,
    token_set_jaccard,
)
from fia_own_map_spark.plans.pipeline import run_pipeline
from fia_own_map_spark.sources.checkpoint import CheckpointStore
from fia_own_map_spark.testing.oracle import oracle_clusters, pairwise_prf


def test_jaro_winkler_known_values():
    assert jaro_winkler("MARTHA", "MARHTA") == pytest.approx(0.9611, abs=1e-4)
    assert jaro_winkler("DWAYNE", "DUANE") == pytest.approx(0.84, abs=1e-2)
    assert jaro_winkler("DIXON", "DICKSONX") == pytest.approx(0.8133, abs=1e-3)
    assert jaro_winkler("SAME", "SAME") == 1.0
    assert jaro_winkler("ABC", "XYZ") == 0.0


def test_spark_similarity_matches_py(spark):
    pairs = [
        ("JOHN SMITH", "JON SMITH"),
        ("CASCADE HOLDINGS", "CASCADE HOLDING"),
        ("ALPHA", "OMEGA"),
        ("", "X"),
    ]
    pdf = pd.DataFrame(pairs, columns=["a", "b"])
    sdf = spark.createDataFrame(pdf)
    got = (
        sdf.select(
            jaro_winkler_sim("a", "b").alias("jw"),
            levenshtein_ratio("a", "b").alias("lr"),
            token_set_jaccard(F.split("a", " "), F.split("b", " ")).alias("jc"),
        )
        .toPandas()
    )
    for i, (a, b) in enumerate(pairs):
        assert got["jw"][i] == pytest.approx(jaro_winkler(a, b), abs=1e-12)
        assert got["lr"][i] == pytest.approx(levenshtein_ratio_py(a, b), abs=1e-12)
        sa, sb = set(a.split(" ")), set(b.split(" "))
        want_jc = len(sa & sb) / len(sa | sb) if (sa | sb) else 1.0
        assert got["jc"][i] == pytest.approx(want_jc, abs=1e-12)


def test_similarity_mode_pipeline(spark, tmp_path):
    """Similarity mode scores all within-block pairs; with near-1 thresholds
    it refines (never coarsens) the exact-mode partition, and with generous
    thresholds it should stay close to the fixpoint oracle on clean data."""
    from fia_own_map_spark.sources.webpages import generate_web_pages

    pages, _ = generate_web_pages(n_pages=800, seed=11)
    sdf = spark.createDataFrame(pages)
    store = CheckpointStore(str(tmp_path), "sim")
    cfg = EngineConfig(score_mode="similarity", jw_threshold=0.85,
                       jaccard_threshold=0.5, lev_ratio_threshold=0.75)
    clusters, metrics = run_pipeline(spark, sdf, cfg, checkpoints=store)
    assert metrics["stages"]["edges"]["pairs_scored"] > 0
    pred = clusters.select("url", "cluster_id").toPandas()

    records = store.read(spark, "records").select(
        "url", "owner1", "owner2", "own_type", "initial_class", "comb_addr"
    ).toPandas()
    golden = oracle_clusters(records)
    prf = pairwise_prf(pred, golden)
    # similarity scoring is a refinement of key-equality blocking: precision
    # against the fixpoint stays 1.0-ish; recall dips only where phonetic-equal
    # names are textually dissimilar.
    assert prf["precision"] >= 0.99, prf
    assert prf["recall"] >= 0.90, prf
