"""Unit tests: double metaphone (canonical vectors + invariants)."""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from fia_own_map_spark.functions.phonetic import double_metaphone

# Canonical outputs of the published Double Metaphone algorithm.
CANONICAL = {
    "SMITH": ("SM0", "XMT"),
    "SMYTH": ("SM0", "XMT"),
    "JOHNSON": ("JNSN", "ANSN"),
    "WILLIAMS": ("ALMS", "FLMS"),
    "CATHERINE": ("K0RN", "KTRN"),
    "KATHERINE": ("K0RN", "KTRN"),
    "THOMAS": ("TMS", "TMS"),
    "SCHMIDT": ("XMT", "SMT"),
    "XAVIER": ("SF", "SFR"),
    "KNIGHT": ("NT", "NT"),
    "WRIGHT": ("RT", "RT"),
    "PHILIP": ("FLP", "FLP"),
    "FILIP": ("FLP", "FLP"),
    "MCDONALD": ("MKTNLT", "MKTNLT"),
    "GALLEGOS": ("KLKS", "KKS"),
    "CABRILLO": ("KPRL", "KPR"),
}

PHONETIC_EQUAL_PAIRS = [
    ("SMITH", "SMYTH"),
    ("PHILIP", "FILIP"),
    ("CATHERINE", "KATHERINE"),
    ("JONSON", "JONSEN"),
    ("MEYER", "MEIER"),
    ("ANDERSON", "ANDERSEN"),
]


@pytest.mark.parametrize("word,expected", sorted(CANONICAL.items()))
def test_canonical_vectors(word, expected):
    assert double_metaphone(word) == expected


@pytest.mark.parametrize("a,b", PHONETIC_EQUAL_PAIRS)
def test_phonetic_equivalents_share_primary(a, b):
    assert double_metaphone(a)[0] == double_metaphone(b)[0]


def test_empty_and_nonalpha():
    assert double_metaphone("") == ("", "")
    assert double_metaphone("12345") == ("", "")
    assert double_metaphone("SMITH2") == double_metaphone("SMITH")


def test_untruncated_codes():
    # the reference feeds whole concatenated names; codes must not cap at 4
    p, s = double_metaphone("CHUNGGROUPJENNIFERWATERS")
    assert len(p) > 4


@settings(max_examples=300, deadline=None)
@given(st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=0x2FF), max_size=40))
def test_deterministic_and_total(s):
    a = double_metaphone(s)
    b = double_metaphone(s)
    assert a == b
    assert all(isinstance(x, str) for x in a)
    # codes only contain the DM output alphabet
    for code in a:
        assert all(c in "0AFHJKLMNPRSTX" for c in code)
