"""Evidence that the similarity-scoring stage (the north-star extension over
the reference's exact-key matching) adds recall: metaphone-BREAKING typos
(generator corruption §4) split exact-mode clusters but survive JW/Lev
scoring."""

import pytest

from fia_own_map_spark.config import EngineConfig
from fia_own_map_spark.plans.pipeline import run_pipeline
from fia_own_map_spark.sources.checkpoint import CheckpointStore
from fia_own_map_spark.sources.webpages import generate_web_pages


def _entity_prf(clusters_pdf, truth) -> tuple[float, float]:
    """Pairwise (precision, recall) against generator entity ground truth."""
    merged = clusters_pdf.merge(truth[["url", "entity_id"]], on="url")

    def pairs(counts):
        return int((counts * (counts - 1) // 2).sum())

    both = pairs(merged.groupby(["cluster_id", "entity_id"]).size())
    gold = pairs(merged.groupby("entity_id").size())
    pred = pairs(merged.groupby("cluster_id").size())
    return (both / pred if pred else 1.0, both / gold if gold else 1.0)


@pytest.mark.slow
def test_soundex_plus_similarity_improves_entity_recall(spark, tmp_path):
    """Metaphone-breaking typos (3% of mentions) leave the reference's
    metaphone blocks; the soundex key family re-blocks them and similarity
    scoring prunes the extra candidates — recall rises, precision holds."""
    pages, truth = generate_web_pages(n_pages=1200, seed=33)
    sdf = spark.createDataFrame(pages)

    exact_clusters, _ = run_pipeline(
        spark, sdf, EngineConfig(score_mode="exact"),
        checkpoints=CheckpointStore(str(tmp_path / "e"), "exact"),
    )
    sim_clusters, metrics = run_pipeline(
        spark, sdf,
        EngineConfig(score_mode="similarity", use_soundex_keys=True,
                     jw_threshold=0.90, lev_ratio_threshold=0.82,
                     jaccard_threshold=0.6),
        checkpoints=CheckpointStore(str(tmp_path / "s"), "sim"),
    )
    p_exact, r_exact = _entity_prf(
        exact_clusters.select("url", "cluster_id").toPandas(), truth
    )
    p_sim, r_sim = _entity_prf(
        sim_clusters.select("url", "cluster_id").toPandas(), truth
    )
    assert r_sim > r_exact, (r_exact, r_sim)
    assert p_sim >= 0.95, (p_exact, p_sim)
    assert metrics["stages"]["edges"]["pairs_scored"] > 0
