"""Property tests for the similarity measures (hypothesis) + bitwise parity
of the numpy batch JW kernel against the scalar reference."""

import random

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from fia_own_map_spark.functions.similarity import (
    jaro,
    jaro_winkler,
    jaro_winkler_batch,
    levenshtein_ratio_py,
    token_set_jaccard_py,
)

words = st.text(alphabet="ABCDEFG ", max_size=25)


def test_jw_batch_bitwise_parity_fuzz():
    """The production numpy kernel must be bitwise-equal to the scalar
    strcmp95 reference (which is itself fuzz-verified vs DuckDB) on an
    adversarial corpus: equals, prefixes, transpositions, empties, unicode."""
    rng = random.Random(7)
    alpha = "ABCDEFGHIJKLMNOPQRSTUVWXYZ '&-0123456789"

    def rand_name():
        return "".join(rng.choice(alpha) for _ in range(rng.randint(0, 30)))

    pairs = []
    for _ in range(20000):
        kind = rng.random()
        s1 = rand_name()
        if kind < 0.15:
            s2 = s1
        elif kind < 0.3:
            s2 = s1[: rng.randint(0, len(s1))] + rand_name()
        elif kind < 0.4:
            chars = list(s1)
            for _ in range(rng.randint(0, 3)):
                if len(chars) > 1:
                    i = rng.randrange(len(chars) - 1)
                    chars[i], chars[i + 1] = chars[i + 1], chars[i]
            s2 = "".join(chars)
        else:
            s2 = rand_name()
        pairs.append((s1, s2))
    pairs += [
        ("", ""), ("", "A"), ("A", ""), ("A", "A"), ("AB", "BA"),
        ("MARTHA", "MARHTA"), ("DWAYNE", "DUANE"), ("DIXON", "DICKSONX"),
        ("MÜLLER", "MULLER"), ("日本語テスト", "日本語のテスト"), ("ÁÉÍÓÚ", "AEIOU"),
    ]
    a = np.array([p[0] for p in pairs], dtype=object)
    b = np.array([p[1] for p in pairs], dtype=object)
    got = jaro_winkler_batch(a, b)
    exp = np.array([jaro_winkler(x, y) for x, y in pairs])
    assert (got == exp).all()  # bitwise, not approx


def test_jw_batch_nulls():
    a = np.array(["A", None, "B", None], dtype=object)
    b = np.array([None, None, "B", "C"], dtype=object)
    got = jaro_winkler_batch(a, b)
    assert np.isnan(got[[0, 1, 3]]).all() and got[2] == 1.0


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
