"""Unit tests for the training-data operators (dedup / ANN / text /
multimodal plumbing) and the classifier ladder."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from fia_own_map_spark.operators import ann, dedup, multimodal, text
from fia_own_map_spark.operators.classify import classify_own_type, with_initial_class


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog", "en"),
        (1, "the quick brown fox jumps over the lazy dog", "en"),   # exact dup of 0
        (2, "The  quick Brown fox jumps over the lazy dog", "en"),  # ws/case dup of 0
        (3, "the quick brown fox leaps over the lazy dog", "en"),   # near dup
        (4, "der hund ist nicht mit der katze und das haus", "de"),
        (5, "el perro y el gato en la casa de los arboles", "es"),
        (6, "completely different text about spark engines and shuffles", "en"),
        (7, "", "en"),
    ]
    return spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text", "lang"]))


def test_exact_dedup(docs):
    kept = dedup.exact_dedup(docs).select("doc_id").toPandas()["doc_id"].tolist()
    assert 0 in kept and 1 not in kept and 2 not in kept
    assert {3, 4, 5, 6, 7} <= set(kept)


def test_minhash_finds_near_dup(docs):
    pairs = dedup.minhash_lsh_pairs(
        docs, n_hashes=16, n_bands=8, shingle_k=2, jaccard_threshold=0.4
    ).toPandas()
    got = {tuple(x) for x in pairs[["id_a", "id_b"]].itertuples(index=False)}
    assert (0, 1) in got and (0, 2) in got  # exact dups always survive
    assert (0, 3) in got                    # near dup: 1-word change
    assert not any((a, b) in got for a, b in [(0, 6), (0, 4), (4, 5)])


def test_simhash_near_dup(docs):
    pairs = dedup.simhash_dup_pairs(docs, max_hamming=6).toPandas()
    got = {tuple(x) for x in pairs[["id_a", "id_b"]].itertuples(index=False)}
    assert (0, 1) in got and (0, 2) in got
    assert (0, 6) not in got


def test_lang_id(docs):
    got = dict(
        docs.select("doc_id", text.lang_id("text").alias("l")).toPandas().values
    )
    assert got[0] == "en" and got[4] == "de" and got[5] == "es"
    assert got[7] == "und"


def test_quality_and_counts(docs):
    q = text.quality_features(docs).toPandas().set_index("doc_id")
    assert q.loc[0, "n_tokens"] == 9
    assert q.loc[7, "n_tokens"] == 0 and q.loc[7, "quality_score"] == pytest.approx(0.3)
    assert 0 <= q["quality_score"].min() and q["quality_score"].max() <= 1


def test_winnow_fingerprint_deterministic(docs):
    a = docs.select("doc_id", text.doc_fingerprint("text").alias("fp")).toPandas()
    b = docs.select("doc_id", text.doc_fingerprint("text").alias("fp")).toPandas()
    assert a.sort_values("doc_id")["fp"].map(tuple).tolist() == \
           b.sort_values("doc_id")["fp"].map(tuple).tolist()
    # identical docs -> identical fingerprints
    fp = a.set_index("doc_id")["fp"]
    assert tuple(fp[0]) == tuple(fp[1])


def test_ann_bruteforce_vs_numpy(spark):
    rng = np.random.default_rng(0)
    vecs = rng.standard_normal((60, 8)).astype("float32")
    pdf = pd.DataFrame({"vec_id": range(60), "embedding": [v.tolist() for v in vecs]})
    corpus = spark.createDataFrame(pdf)
    queries = corpus.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = ann.cosine_topk(corpus, queries, k=5).toPandas()
    norm = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    sims = norm @ norm.T
    for q in range(3):
        order = np.argsort(-np.round(sims[q], 6), kind="stable")[:5]
        want = set(order.tolist())
        got_ids = set(got[got.query_id == q]["vec_id"].tolist())
        assert got_ids == want, (q, got_ids, want)


def test_ann_lsh_subset_of_bucket(spark):
    rng = np.random.default_rng(1)
    vecs = rng.standard_normal((80, 8)).astype("float32")
    pdf = pd.DataFrame({"vec_id": range(80), "embedding": [v.tolist() for v in vecs]})
    corpus = spark.createDataFrame(pdf)
    queries = corpus.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = ann.lsh_cosine_topk(corpus, queries, k=5, n_planes=4).toPandas()
    # self-match always lands in its own bucket at rank 1
    for q in range(2):
        sub = got[got.query_id == q]
        assert sub[sub["rank"] == 1]["vec_id"].iloc[0] == q


def test_multimodal_plumbing(spark):
    blobs = [
        ("m1", multimodal.make_fake_image("m1", 4, 4, seed=1)),
        ("m2", multimodal.make_fake_image("m2", 8, 2, seed=2)),
    ]
    df = spark.createDataFrame(pd.DataFrame(blobs, columns=["media_id", "blob"]))
    out = multimodal.decode_and_featurize(df, fake=True).toPandas().set_index("media_id")
    assert out.loc["m1", "width"] == 4 and out.loc["m2", "height"] == 2
    assert len(out.loc["m1", "features"]) == 4
    # library-codec bitstreams (PNG/JPEG) are stubbed: must raise, not fake
    png = [("p1", b"\x89PNG\r\n\x1a\n" + b"\x00" * 16)]
    pdf = spark.createDataFrame(pd.DataFrame(png, columns=["media_id", "blob"]))
    with pytest.raises(Exception, match="NotImplementedError|PNG/JPEG"):
        multimodal.decode_and_featurize(pdf).collect()


def test_multimodal_bmp_real_codec(spark):
    """BMP is the real decode path: decode -> featurize and decode -> resize
    -> re-encode roundtrip through Spark binary columns."""
    import numpy as np

    rng = np.random.default_rng(7)
    img1 = rng.integers(0, 256, size=(6, 10, 3), dtype=np.uint8)
    img2 = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    blobs = [("b1", multimodal.encode_bmp(img1)), ("b2", multimodal.encode_bmp(img2))]
    df = spark.createDataFrame(pd.DataFrame(blobs, columns=["media_id", "blob"]))
    out = multimodal.decode_and_featurize(df).toPandas().set_index("media_id")
    assert out.loc["b1", "width"] == 10 and out.loc["b1", "height"] == 6
    assert abs(out.loc["b2", "features"][0] - float(img2.mean())) < 1e-9
    resized = multimodal.resize_images(df, 4, 4).toPandas().set_index("media_id")
    back = multimodal.decode_bmp(bytes(resized.loc["b2", "blob"]))
    assert back.shape == (4, 4, 3)
    assert (back == multimodal.resize_nearest(img2, 4, 4)).all()


def test_classifier_cascade(spark):
    rows = [
        ("JOHN A SMITH", None, 45),
        ("SMITH FAMILY TRUST", None, 45),
        ("CASCADE HOLDINGS LLC", None, 41),
        ("PINNACLE HOMEOWNERS ASSOCIATION", None, 42),
        ("GRANITE CEMETERY", None, 43),
        ("FIRST BAPTIST CHURCH", None, 43),
        ("UNITED STATES FOREST SERVICE", None, 25),
        ("CITY OF RIVERTON", None, 32),
        ("STATE OF FRANKLIN DEPT OF NATURAL RESOURCES", None, 31),
        ("NOT AVAILABLE", None, -99),
    ]
    pdf = pd.DataFrame(rows, columns=["owner1", "owner2", "want"])
    sdf = spark.createDataFrame(pdf)
    sdf = with_initial_class(sdf, "owner1", "owner2")
    got = classify_own_type(sdf, "owner1", "owner2").select("owner1", "own_type", "want").toPandas()
    for _, r in got.iterrows():
        assert r["own_type"] == r["want"], (r["owner1"], r["own_type"], r["want"])


def test_ann_ivf_recall(spark):
    """IVF probes nprobe nearest cells; recall@k vs the brute-force baseline
    must be high on a clusterable fixture and the index must be reusable."""
    import numpy as np

    rng = np.random.default_rng(5)
    centers = rng.standard_normal((4, 8)) * 3
    rows = []
    for i in range(200):
        c = i % 4
        v = centers[c] + rng.standard_normal(8) * 0.3
        rows.append((i, [float(x) for x in v]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = ann.cosine_topk(emb, queries, k=5).toPandas()
    indexed, cents = ann.ivf_index(emb, n_cells=8)
    approx = ann.ivf_cosine_topk(
        emb, queries, k=5, nprobe=3, indexed=indexed, centroids=cents
    ).toPandas()
    hits = 0
    for q in range(5):
        e = set(exact[exact.query_id == q]["vec_id"])
        a = set(approx[approx.query_id == q]["vec_id"])
        hits += len(e & a)
    recall = hits / (5 * 5)
    assert recall >= 0.8, recall
    # self-hit must rank first (cosine 1.0)
    for q in range(5):
        sub = approx[approx.query_id == q]
        assert sub[sub["rank"] == 1]["vec_id"].iloc[0] == q


def test_ann_ivf_big_quantizer_join_path(spark, monkeypatch):
    """The broadcast-join probing path (big quantizers) must return the same
    cells as the literal-array path."""
    from fia_own_map_spark.operators import ann as annmod

    rng = np.random.default_rng(9)
    rows = [(i, [float(x) for x in rng.standard_normal(6)]) for i in range(120)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    indexed, cents = annmod.ivf_index(emb, n_cells=6)
    lit = annmod.ivf_cosine_topk(emb, queries, k=4, nprobe=2,
                                 indexed=indexed, centroids=cents).toPandas()
    monkeypatch.setattr(annmod, "_PROBE_LITERAL_LIMIT", 1)
    joined = annmod.ivf_cosine_topk(emb, queries, k=4, nprobe=2,
                                    indexed=indexed, centroids=cents).toPandas()
    key = ["query_id", "rank"]
    pd.testing.assert_frame_equal(
        lit.sort_values(key).reset_index(drop=True),
        joined.sort_values(key).reset_index(drop=True),
    )


def test_asof_join_semantics(spark):
    """Backward inclusive as-of: equal timestamps match; rows before any
    right row get nulls; latest-not-future right row wins."""
    from datetime import datetime

    from fia_own_map_spark.operators.asof import asof_join

    right = spark.createDataFrame(
        [(1, datetime(2024, 1, 1, 10), 100), (1, datetime(2024, 1, 1, 12), 200),
         (2, datetime(2024, 1, 1, 11), 300)],
        "k long, ts timestamp, rv long",
    )
    left = spark.createDataFrame(
        [(1, datetime(2024, 1, 1, 9), "before-any"),
         (1, datetime(2024, 1, 1, 10), "tie-inclusive"),
         (1, datetime(2024, 1, 1, 11, 30), "between"),
         (1, datetime(2024, 1, 1, 13), "after-all"),
         (3, datetime(2024, 1, 1, 13), "no-right-key")],
        "k long, ts timestamp, tag string",
    )
    got = {r["tag"]: r["rv"] for r in
           asof_join(left, right, ["k"], "ts", "ts", ["rv"]).collect()}
    assert got == {"before-any": None, "tie-inclusive": 100, "between": 100,
                   "after-all": 200, "no-right-key": None}


def test_asof_join_preserves_matched_nulls(spark):
    """A matched right row whose own value is NULL must stay NULL — not
    inherit an older non-null value (ADVICE r2: struct-carry semantics,
    matching DuckDB/pandas ASOF JOIN)."""
    from datetime import datetime

    from fia_own_map_spark.operators.asof import asof_join

    right = spark.createDataFrame(
        [(1, datetime(2024, 1, 1, 10), 100), (1, datetime(2024, 1, 1, 12), None)],
        "k long, ts timestamp, rv long",
    )
    left = spark.createDataFrame(
        [(1, datetime(2024, 1, 1, 11), "hits-100"),
         (1, datetime(2024, 1, 1, 13), "hits-null-row")],
        "k long, ts timestamp, tag string",
    )
    got = {r["tag"]: r["rv"] for r in
           asof_join(left, right, ["k"], "ts", "ts", ["rv"]).collect()}
    assert got == {"hits-100": 100, "hits-null-row": None}
