"""Trigram-LM perplexity scoring: mirror parity, invariants, filtering."""
import pytest
from pyspark.sql import functions as F

from fia_own_map_spark.operators.lm import (
    BOS,
    LOG_SCALE,
    lm_doc_scores,
    lm_filter,
    lm_trigram_events,
    train_trigram_lm,
    trigram_lm_py,
)

TEXTS = {
    0: "the cat sat on the mat and the cat sat again",
    1: "the cat sat on the mat",
    2: "completely different words entirely unrelated to anything else",
    3: None,
    4: "   ",
    5: "one",
    6: "the cat sat on the mat and the cat sat again",  # exact dup of 0
}


@pytest.fixture()
def corpus(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in TEXTS.items()], "doc_id long, text string"
    )


def test_events_shape(corpus):
    ev = lm_trigram_events(corpus).collect()
    n_tokens = sum(len(t.split()) for t in TEXTS.values() if t and t.strip())
    assert len(ev) == n_tokens  # exactly one event per token
    first = [r for r in ev if r["a"] == BOS and r["b"] == BOS]
    assert len(first) == 5  # one doc-initial event per non-empty doc


def test_mirror_parity(corpus):
    lm = train_trigram_lm(corpus)
    got = {
        r["doc_id"]: (r["n_trigrams"], r["logprob_q"], r["logprob_per_token"])
        for r in lm_doc_scores(corpus, lm).collect()
    }
    assert got == trigram_lm_py(TEXTS)


def test_scores_are_partitioning_invariant(corpus):
    lm1 = train_trigram_lm(corpus)
    s1 = {r["doc_id"]: r["logprob_q"]
          for r in lm_doc_scores(corpus, lm1).collect()}
    rep = corpus.repartition(7, "doc_id")
    lm2 = train_trigram_lm(rep)
    s2 = {r["doc_id"]: r["logprob_q"]
          for r in lm_doc_scores(rep, lm2).collect()}
    assert s1 == s2  # quantized-integer currency: bit-stable


def test_ordering_and_duplicates(corpus):
    lm = train_trigram_lm(corpus)
    got = {r["doc_id"]: r for r in lm_doc_scores(corpus, lm).collect()}
    # identical docs score identically
    assert got[0]["logprob_q"] == got[6]["logprob_q"]
    # in-model repetitive text beats the one-off vocabulary doc
    assert got[0]["logprob_per_token"] > got[2]["logprob_per_token"]
    # empty/NULL docs: no score
    assert got[3]["n_trigrams"] == 0 and got[3]["logprob_q"] is None
    assert got[4]["n_trigrams"] == 0
    assert got[5]["n_trigrams"] == 1


def test_filter_keeps_head(corpus):
    lm = train_trigram_lm(corpus)
    scores = {r["doc_id"]: r["logprob_per_token"]
              for r in lm_doc_scores(corpus, lm).collect()}
    cut = scores[2] + 1e-9  # drop the worst scoring doc + scoreless docs
    kept = {r["doc_id"] for r in lm_filter(corpus, lm, cut).collect()}
    assert 2 not in kept and 3 not in kept and 4 not in kept
    assert 0 in kept and 6 in kept
    assert kept == {i for i, s in scores.items() if s is not None and s >= cut}


def test_plan_has_no_window_or_cartesian(corpus):
    import io
    from contextlib import redirect_stdout

    lm = train_trigram_lm(corpus)
    buf = io.StringIO()
    with redirect_stdout(buf):
        lm_doc_scores(corpus, lm).explain()
    plan = buf.getvalue()
    assert "Window" not in plan
    assert "CartesianProduct" not in plan


def test_sf001_mirror_parity(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    lm = train_trigram_lm(docs)
    got = {
        r["doc_id"]: (r["n_trigrams"], r["logprob_q"], r["logprob_per_token"])
        for r in lm_doc_scores(docs, lm).collect()
    }
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    assert got == trigram_lm_py(texts)
    assert len(got) == 500


def test_edge_whitespace_parity(spark):
    """r7 review: F.trim strips spaces only, so tab-edged text used to
    produce EMPTY edge tokens on the Spark side that the python word
    mirror never saw. With collapse-then-trim normalization the mirror,
    Spark, and the oracle share one convention."""
    texts = {
        0: "\tthe cat\tsat  on\tthe mat\t",   # edge tabs + mixed ws
        1: "the cat sat on the mat",           # same content, clean edges
        2: "\t \t",                            # whitespace-only: no tokens
        3: "plain other words here",
    }
    df = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id long, text string"
    )
    lm = train_trigram_lm(df)
    got = {
        r["doc_id"]: (r["n_trigrams"], r["logprob_q"], r["logprob_per_token"])
        for r in lm_doc_scores(df, lm).collect()
    }
    assert got == trigram_lm_py(texts)
    # normalization makes 0 and 1 the same token stream -> same score
    assert got[0] == got[1]
    assert got[2] == (0, None, None)
