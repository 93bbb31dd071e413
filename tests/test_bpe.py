"""Trained BPE subword tokenizer — distributed trainer vs clean-room mirror.

train_bpe iterates over the DISTINCT-WORD table (one shuffle + a one-row
collect per merge); bpe_train_py is the single-machine mirror with the same
normalization, greedy-leftmost pass, and (count desc, pair asc) tie-break.
The tests assert IDENTICAL merge lists and tokenizations, on a hand corpus
and on the sf0.001 documents table.
"""
import pytest

from fia_own_map_spark.operators.dedup import normalized_words_py
from fia_own_map_spark.operators.bpe import (
    END,
    bpe_token_count,
    bpe_tokens,
    bpe_train_py,
    bpe_word_py,
    train_bpe,
)

SF = "/root/testdata/sf0.001"


def _py_doc_tokens(t: str, merges) -> list[str]:
    out = []
    for w in normalized_words_py(t):
        out.extend(bpe_word_py(w, merges))
    return out


def test_bpe_train_hand_corpus_parity(spark):
    texts = ["the cat sat on the mat", "the cats sat", "a mat on the cat",
             None, "  the   the  "]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    m_spark = train_bpe(df, n_merges=12)
    m_py = bpe_train_py(texts, n_merges=12)
    assert m_spark == m_py
    assert len(m_spark) > 0
    # the most frequent word fuses to a single subword under its own merges
    assert bpe_word_py("the", m_spark) == ["the" + END]


def test_bpe_apply_matches_trainer_end_state(spark):
    """Applying the learned merges in training order reproduces whole-word
    fusions for frequent training words and splits unseen words into
    learned subwords."""
    texts = ["low lower lowest", "low lower", "low new newer"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    merges = train_bpe(df, n_merges=20, min_pair_count=2)
    assert merges == bpe_train_py(texts, n_merges=20, min_pair_count=2)
    got = {r["doc_id"]: r["toks"] for r in df.select(
        "doc_id", bpe_tokens("text", merges).alias("toks")).collect()}
    for i, t in enumerate(texts):
        assert got[i] == _py_doc_tokens(t, merges)


def test_bpe_sf001_corpus_parity(spark):
    """Corpus-scale check on the sf0.001 documents table: the distributed
    trainer's merge list equals the mirror's, and the Arrow-batched
    tokenizer equals the mirror tokenization on every document."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    merges = train_bpe(docs, n_merges=25)
    texts = [r["text"] for r in docs.select("text").collect()]
    assert merges == bpe_train_py(texts, n_merges=25)
    assert len(merges) == 25  # corpus is rich enough to sustain 25 merges

    # tokenize ONCE and count from the tokens column (the documented
    # pattern: a second bpe_tokens call would be an independent UDF that
    # re-runs the whole apply)
    got = {r["doc_id"]: (r["toks"], r["n"]) for r in docs.select(
        "doc_id", bpe_tokens("text", merges).alias("toks")
    ).withColumn("n", bpe_token_count("toks")).collect()}
    by_id = {r["doc_id"]: r["text"] for r in docs.collect()}
    assert len(got) == 500
    for doc_id, text in by_id.items():
        toks, n = got[doc_id]
        if text is None:
            assert toks is None
            continue
        want = _py_doc_tokens(text, merges)
        assert toks == want
        assert n == len(want)


def test_bpe_deterministic_tiebreak(spark):
    """Equal-count pairs resolve by (a asc, b asc) in both engines —
    the property that makes the trained table reproducible."""
    # four single-char words, so (p,</w>), (q,</w>), (x,</w>), (y,</w>)
    # all tie at count 2
    texts = ["x y", "x y", "p q", "p q"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    m_spark = train_bpe(df, n_merges=2)
    m_py = bpe_train_py(texts, n_merges=2)
    assert m_spark == m_py
    assert m_spark[0][0] <= m_spark[1][0]  # lexicographically-first pair won


def test_bpe_unicode_whitespace_parity(spark):
    """NBSP and line-separator are NOT word breaks on the JVM (Java \\s is
    ASCII-only); the python mirror and the apply UDF must agree — this was
    a live divergence when the python side used unicode-aware re \\s."""
    texts = ["foo bar baz", "foo bar qux", "a b a b"]
    assert normalized_words_py(texts[0]) == ["foo bar", "baz"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    merges = train_bpe(df, n_merges=6)
    assert merges == bpe_train_py(texts, n_merges=6)
    got = {r["doc_id"]: r["toks"] for r in df.select(
        "doc_id", bpe_tokens("text", merges).alias("toks")).collect()}
    for i, t in enumerate(texts):
        assert got[i] == _py_doc_tokens(t, merges)


# ---------------------------------------------------------------------------
# pure-python property tests (no Spark session — hypothesis over the mirror)
# ---------------------------------------------------------------------------
from hypothesis import given, settings
from hypothesis import strategies as st

_words = st.text(alphabet="abcde", min_size=1, max_size=12)


@settings(max_examples=200, deadline=None)
@given(st.lists(_words, min_size=1, max_size=30), st.integers(0, 40))
def test_bpe_lossless_and_monotone(words, n_merges):
    """Invariants of the apply path under any trained table: (1) subwords
    concatenate back to the exact word + end marker (tokenization is
    lossless), (2) every subword is in the closure of chars + learned
    merges, (3) more merges never increases the token count of any word."""
    corpus = [" ".join(words)]
    merges = bpe_train_py(corpus, n_merges=n_merges, min_pair_count=2)
    vocab = set("abcde") | {END}
    for a, b in merges:
        vocab.add(a + b)
    prev_counts = None
    for upto in range(len(merges) + 1):
        counts = {}
        for w in words:
            toks = bpe_word_py(w, merges[:upto])
            assert "".join(toks) == w + END
            assert all(t in vocab for t in toks)
            counts[w] = min(counts.get(w, 1 << 30), len(toks))
        if prev_counts is not None:
            for w in words:
                assert counts[w] <= prev_counts[w]
        prev_counts = counts


def test_bpe_training_releases_checkpoint_blocks(spark):
    """The incremental trainer must not leak localCheckpoint blocks across
    iterations (a 32k-merge production vocab would otherwise exhaust the
    block store): after training, no trainer RDD may remain persisted."""
    before = spark.sparkContext._jsc.sc().getPersistentRDDs().size()
    texts = ["ab ab ab abc", "ab abc abc", "xy xy ab"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    m = train_bpe(df, n_merges=8)
    assert m == bpe_train_py(texts, n_merges=8)
    after = spark.sparkContext._jsc.sc().getPersistentRDDs().size()
    assert after <= before
