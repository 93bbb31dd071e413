"""Property tests for the similarity measures (hypothesis)."""

from hypothesis import given, settings
from hypothesis import strategies as st

from fia_own_map_spark.functions.similarity import (
    jaro,
    jaro_winkler,
    levenshtein_ratio_py,
    token_set_jaccard_py,
)

words = st.text(alphabet="ABCDEFG ", max_size=25)


@settings(max_examples=300, deadline=None)
@given(words, words)
def test_jw_properties(a, b):
    j = jaro_winkler(a, b)
    assert 0.0 <= j <= 1.0
    assert jaro_winkler(b, a) == j  # symmetric
    assert jaro(a, b) <= j + 1e-12  # boost never decreases


@settings(max_examples=200, deadline=None)
@given(words)
def test_identity(a):
    if a:
        assert jaro_winkler(a, a) == 1.0
        assert levenshtein_ratio_py(a, a) == 1.0
    toks = a.split()
    assert token_set_jaccard_py(toks, toks) == 1.0


@settings(max_examples=200, deadline=None)
@given(words, words)
def test_lev_jaccard_ranges(a, b):
    assert 0.0 <= levenshtein_ratio_py(a, b) <= 1.0
    assert 0.0 <= token_set_jaccard_py(a.split(), b.split()) <= 1.0
    assert levenshtein_ratio_py(a, b) == levenshtein_ratio_py(b, a)
