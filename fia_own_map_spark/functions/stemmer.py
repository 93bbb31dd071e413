"""Porter stemmer — clean-room implementation of the published algorithm
(M.F. Porter, "An algorithm for suffix stripping", Program 14(3), 1980),
plus the documented NLTK-mode departures, because the reference pipeline
stems with ``nltk.stem.PorterStemmer()`` (default NLTK_EXTENSIONS mode;
`Classify_Unknowns_opt.py:110-117`).

Modes:
  * ``original`` — the 1980 paper, verified against the worked examples
    published in the paper itself (tests/test_stemmer.py).
  * ``nltk``     — the extensions nltk documents in its porter module:
    irregular-forms pool, <=2-length passthrough, ies/ied -> ie for 4-letter
    words, y->i only after a non-initial consonant, alli->al applied before
    (a)bli with a re-run, fulli->ful, logi->log keeping the l, and the
    2-letter vowel-consonant CVC acceptance.

Pure python, total, deterministic — shared by the Arrow-batched stemming UDF
(operators/ml.py) and the pandas test oracle.
"""

from __future__ import annotations

_VOWELS = frozenset("aeiou")

# nltk's irregular-forms pool (documented NLTK_EXTENSIONS behavior)
_POOL = {
    "skies": "sky", "sky": "sky",
    "dying": "die", "lying": "lie", "tying": "tie",
    "news": "news",
    "innings": "inning", "inning": "inning",
    "outings": "outing", "outing": "outing",
    "cannings": "canning", "canning": "canning",
    "howe": "howe",
    "proceed": "proceed", "exceed": "exceed", "succeed": "succeed",
}


def _is_consonant(word: str, i: int) -> bool:
    ch = word[i]
    if ch in _VOWELS:
        return False
    if ch == "y":
        return True if i == 0 else not _is_consonant(word, i - 1)
    return True


def _measure(stem: str) -> int:
    """m in the [C](VC)^m[V] decomposition."""
    m = 0
    prev_cons = None
    for i in range(len(stem)):
        cons = _is_consonant(stem, i)
        if prev_cons is False and cons:
            m += 1
        prev_cons = cons
    return m


def _contains_vowel(stem: str) -> bool:
    return any(not _is_consonant(stem, i) for i in range(len(stem)))


def _ends_double_consonant(word: str) -> bool:
    return (
        len(word) >= 2
        and word[-1] == word[-2]
        and _is_consonant(word, len(word) - 1)
    )


def _ends_cvc(word: str, nltk_mode: bool) -> bool:
    if (
        len(word) >= 3
        and _is_consonant(word, len(word) - 3)
        and not _is_consonant(word, len(word) - 2)
        and _is_consonant(word, len(word) - 1)
        and word[-1] not in "wxy"
    ):
        return True
    return (
        nltk_mode
        and len(word) == 2
        and not _is_consonant(word, 0)
        and _is_consonant(word, 1)
    )


def _apply_rules(word: str, rules) -> str:
    """First rule whose suffix matches fires; its condition gates the
    replacement but a failed condition still stops the scan (Porter's
    longest-match-then-stop semantics)."""
    for suffix, repl, cond in rules:
        if word.endswith(suffix):
            stem = word[: len(word) - len(suffix)]
            if cond is None or cond(stem):
                return stem + repl
            return word
    return word


def _m_gt0(stem: str) -> bool:
    return _measure(stem) > 0


def _m_gt1(stem: str) -> bool:
    return _measure(stem) > 1


class PorterStemmer:
    def __init__(self, mode: str = "nltk"):
        assert mode in ("nltk", "original")
        self.nltk_mode = mode == "nltk"

    # -- steps ------------------------------------------------------------
    def _step1a(self, word: str) -> str:
        if self.nltk_mode and word.endswith("ies") and len(word) == 4:
            return word[:-3] + "ie"
        return _apply_rules(
            word,
            [("sses", "ss", None), ("ies", "i", None), ("ss", "ss", None), ("s", "", None)],
        )

    def _step1b(self, word: str) -> str:
        if self.nltk_mode and word.endswith("ied"):
            return word[:-3] + ("ie" if len(word) == 4 else "i")
        if word.endswith("eed"):
            stem = word[:-3]
            return stem + "ee" if _measure(stem) > 0 else word
        stem = None
        for suffix in ("ed", "ing"):
            if word.endswith(suffix):
                candidate = word[: len(word) - len(suffix)]
                if _contains_vowel(candidate):
                    stem = candidate
                break
        if stem is None:
            return word
        if stem.endswith(("at", "bl", "iz")):
            return stem + "e"
        if _ends_double_consonant(stem) and stem[-1] not in "lsz":
            return stem[:-1]
        if _measure(stem) == 1 and _ends_cvc(stem, self.nltk_mode):
            return stem + "e"
        return stem

    def _step1c(self, word: str) -> str:
        if not word.endswith("y"):
            return word
        stem = word[:-1]
        if self.nltk_mode:
            ok = len(stem) > 1 and _is_consonant(stem, len(stem) - 1)
        else:
            ok = _contains_vowel(stem)
        return stem + "i" if ok else word

    def _step2(self, word: str) -> str:
        if self.nltk_mode and word.endswith("alli") and _m_gt0(word[:-4]):
            return self._step2(word[:-4] + "al")
        bli_rule = ("bli", "ble", _m_gt0) if self.nltk_mode else ("abli", "able", _m_gt0)
        rules = [
            ("ational", "ate", _m_gt0),
            ("tional", "tion", _m_gt0),
            ("enci", "ence", _m_gt0),
            ("anci", "ance", _m_gt0),
            ("izer", "ize", _m_gt0),
            bli_rule,
            ("alli", "al", _m_gt0),
            ("entli", "ent", _m_gt0),
            ("eli", "e", _m_gt0),
            ("ousli", "ous", _m_gt0),
            ("ization", "ize", _m_gt0),
            ("ation", "ate", _m_gt0),
            ("ator", "ate", _m_gt0),
            ("alism", "al", _m_gt0),
            ("iveness", "ive", _m_gt0),
            ("fulness", "ful", _m_gt0),
            ("ousness", "ous", _m_gt0),
            ("aliti", "al", _m_gt0),
            ("iviti", "ive", _m_gt0),
            ("biliti", "ble", _m_gt0),
        ]
        if self.nltk_mode:
            rules.append(("fulli", "ful", _m_gt0))
            # keep the 'l' with the stem so short stems (geo-, theo-) work
            rules.append(("logi", "log", lambda stem: _m_gt0(word[:-3])))
        return _apply_rules(word, rules)

    def _step3(self, word: str) -> str:
        return _apply_rules(
            word,
            [
                ("icate", "ic", _m_gt0),
                ("ative", "", _m_gt0),
                ("alize", "al", _m_gt0),
                ("iciti", "ic", _m_gt0),
                ("ical", "ic", _m_gt0),
                ("ful", "", _m_gt0),
                ("ness", "", _m_gt0),
            ],
        )

    def _step4(self, word: str) -> str:
        return _apply_rules(
            word,
            [
                ("al", "", _m_gt1),
                ("ance", "", _m_gt1),
                ("ence", "", _m_gt1),
                ("er", "", _m_gt1),
                ("ic", "", _m_gt1),
                ("able", "", _m_gt1),
                ("ible", "", _m_gt1),
                ("ant", "", _m_gt1),
                ("ement", "", _m_gt1),
                ("ment", "", _m_gt1),
                ("ent", "", _m_gt1),
                ("ion", "", lambda stem: _m_gt1(stem) and stem.endswith(("s", "t"))),
                ("ou", "", _m_gt1),
                ("ism", "", _m_gt1),
                ("ate", "", _m_gt1),
                ("iti", "", _m_gt1),
                ("ous", "", _m_gt1),
                ("ive", "", _m_gt1),
                ("ize", "", _m_gt1),
            ],
        )

    def _step5a(self, word: str) -> str:
        if word.endswith("e"):
            stem = word[:-1]
            m = _measure(stem)
            if m > 1 or (m == 1 and not _ends_cvc(stem, self.nltk_mode)):
                return stem
        return word

    def _step5b(self, word: str) -> str:
        if _measure(word) > 1 and _ends_double_consonant(word) and word.endswith("l"):
            return word[:-1]
        return word

    def stem(self, word: str) -> str:
        w = word.lower()
        if self.nltk_mode:
            if w in _POOL:
                return _POOL[w]
            if len(w) <= 2:
                return w
        w = self._step1a(w)
        w = self._step1b(w)
        w = self._step1c(w)
        w = self._step2(w)
        w = self._step3(w)
        w = self._step4(w)
        w = self._step5a(w)
        w = self._step5b(w)
        return w


_DEFAULT = PorterStemmer("nltk")


def porter_stem(word: str) -> str:
    """Module-level nltk-mode stem (the reference pipeline's default)."""
    return _DEFAULT.stem(word)
