"""Deterministic synthetic `web_pages` generator (FIXTURES.md §1/§4).

Shape fixed by BASELINE.json `input_hint`:
    url:string, warc_ts:timestamp, html:binary, text:string, lang:string

The generator embeds owner/entity mentions into templated pages such that the
stage-0 extractor recovers `text` from `html` **byte-identically** (the
per-row invariant). Everything is seeded (seed=42 default, mirroring the
reference's sampling seed at `Full_State_Sample_Generation.py:94`) and
pure-function deterministic — no wall clock, no uuid4 (the reference's uuid4
ids at `Name_Matching_opt.py:80,92,231` are deliberately replaced by
deterministic ids, SURVEY.md §7.4.2).

Corruption model (FIXTURES.md §4): token reorder, abbreviation swap, title
noise, dropped middle token, metaphone-preserving vowel misspellings,
metaphone-*breaking* typos (exercise the similarity stage), unicode accents
(NFKD fold), junior suffixes, 'nan' address artifacts, and one deliberate
mega-entity (skew / salting exercise).
"""

from __future__ import annotations

import html as html_mod
from datetime import datetime, timedelta

import numpy as np
import pandas as pd

from fia_own_map_spark.config import (
    CLASS_CORPORATE,
    CLASS_FAMILY,
    CLASS_FEDERAL,
    CLASS_LOCAL,
    CLASS_OTHER_CORP_42,
    CLASS_OTHER_CORP_43,
    CLASS_STATE,
    CLASS_UNKNOWN,
)

_SURNAMES = [
    "SMITH", "JOHNSON", "WILLIAMS", "BROWN", "JONES", "GARCIA", "MILLER",
    "DAVIS", "RODRIGUEZ", "MARTINEZ", "HERNANDEZ", "LOPEZ", "GONZALEZ",
    "WILSON", "ANDERSON", "THOMAS", "TAYLOR", "MOORE", "JACKSON", "MARTIN",
    "LEE", "PEREZ", "THOMPSON", "WHITE", "HARRIS", "SANCHEZ", "CLARK",
    "RAMIREZ", "LEWIS", "ROBINSON", "WALKER", "YOUNG", "ALLEN", "KING",
    "WRIGHT", "SCOTT", "TORRES", "NGUYEN", "HILL", "FLORES", "GREEN",
    "ADAMS", "NELSON", "BAKER", "HALL", "RIVERA", "CAMPBELL", "MITCHELL",
    "CARTER", "ROBERTS",
]
_GIVEN = [
    "JAMES", "MARY", "ROBERT", "PATRICIA", "JOHN", "JENNIFER", "MICHAEL",
    "LINDA", "WILLIAM", "ELIZABETH", "DAVID", "BARBARA", "RICHARD", "SUSAN",
    "JOSEPH", "JESSICA", "THOMAS", "SARAH", "CHARLES", "KAREN", "MARGARET",
    "EDWARD", "GEORGE", "SAMUEL", "CATHERINE", "BENJAMIN",
]
_CORP_STEMS = [
    "CASCADE", "PINNACLE", "GRANITE", "REDWOOD", "SUMMIT", "HARBOR",
    "MERIDIAN", "STERLING", "FRONTIER", "HERITAGE", "LIBERTY", "PIONEER",
    "EVERGREEN", "WILLOW", "OAKRIDGE", "BLUE RIVER", "SILVER CREEK",
    "NORTH STAR", "IRONWOOD", "CEDAR VALLEY",
]
_CORP_SUFFIX = ["LLC", "INC", "CORP", "LTD", "HOLDINGS LLC", "PROPERTIES LLC", "TIMBER CO"]
_STREETS = ["MAPLE", "OAK", "CEDAR", "ELM", "PINE", "WASHINGTON", "LAKE", "HILL", "RIVER", "SUNSET"]
_MODES = ["ST", "AVE", "RD", "LN", "DR", "BLVD"]
_PREDIRS = ["N", "S", "E", "W", ""]
_REGIONS = ["REGION-A", "REGION-B", "REGION-C"]
_FILLER = (
    "forest parcel acreage survey deed record county assessor tract "
    "boundary timber stand management plan harvest rotation stewardship"
).split()

# Vowel swaps preserve double-metaphone codes (non-initial vowels carry no
# phonetic signal): SMITH -> SMYTH style.
_VOWELS = "AEIOU"

# Abbreviation pairs (NamesExpander analogue, config.py NAMES_EXPANDER inverse)
_ABBREV = {
    "WILLIAM": "WM", "JAMES": "JAS", "JOSEPH": "JOS", "CHARLES": "CHAS",
    "THOMAS": "THOS", "ROBERT": "ROBT", "GEORGE": "GEO", "EDWARD": "EDW",
    "BENJAMIN": "BENJ", "SAMUEL": "SAML", "MARGARET": "MARG",
    "CATHERINE": "CATH", "ELIZABETH": "ELIZ", "RICHARD": "RICH",
}
_ACCENT = {"A": "Á", "E": "É", "I": "Í", "O": "Ó", "U": "Ú", "N": "Ñ"}

_EPOCH = datetime(2024, 1, 1, 0, 0, 0)


def _make_entities(rng: np.random.Generator, n_entities: int) -> pd.DataFrame:
    """Entity pool with class mix + canonical names/addresses."""
    rows = []
    for eid in range(n_entities):
        r = rng.random()
        if eid == 0:
            # the mega-entity (skew exercise): a large corporate owner
            own_class, o1, o2 = CLASS_CORPORATE, "NATIONAL TIMBER HOLDINGS LLC", ""
        elif r < 0.45:
            own_class = CLASS_FAMILY
            o1 = f"{rng.choice(_GIVEN)} {rng.choice(_GIVEN)} {rng.choice(_SURNAMES)}"
            o2 = f"{rng.choice(_GIVEN)} {rng.choice(_SURNAMES)}" if rng.random() < 0.4 else ""
        elif r < 0.65:
            own_class = CLASS_CORPORATE
            o1 = f"{rng.choice(_CORP_STEMS)} {rng.choice(_CORP_SUFFIX)}"
            o2 = ""
        elif r < 0.72:
            own_class = CLASS_OTHER_CORP_42
            o1 = f"{rng.choice(_CORP_STEMS)} HOMEOWNERS ASSOCIATION"
            o2 = ""
        elif r < 0.78:
            own_class = CLASS_OTHER_CORP_43
            o1 = f"{rng.choice(_CORP_STEMS)} {rng.choice(['CEMETERY', 'HOSPITAL', 'ELECTRIC COOP'])}"
            o2 = ""
        elif r < 0.84:
            own_class = CLASS_FEDERAL
            o1 = rng.choice(["UNITED STATES FOREST SERVICE", "US BUREAU OF LAND MANAGEMENT", "USDA FOREST SERVICE"])
            o2 = ""
        elif r < 0.90:
            own_class = CLASS_STATE
            o1 = rng.choice(["STATE OF FRANKLIN DEPT OF NATURAL RESOURCES", "FRANKLIN STATE UNIVERSITY", "COMMONWEALTH LAND OFFICE"])
            o2 = ""
        elif r < 0.96:
            own_class = CLASS_LOCAL
            o1 = rng.choice(["CITY OF RIVERTON", "TOWN OF MAPLE FALLS", "LAKE COUNTY SCHOOL DISTRICT"])
            o2 = ""
        else:
            own_class = CLASS_UNKNOWN
            o1 = "NOT AVAILABLE"
            o2 = ""
        rows.append(
            {
                "entity_id": eid,
                "own_class": own_class,
                "owner1": o1,
                "owner2": o2,
                "addr_num": str(int(rng.integers(1, 9999))),
                "addr_predir": str(rng.choice(_PREDIRS)),
                "addr_street": str(rng.choice(_STREETS)),
                "addr_mode": str(rng.choice(_MODES)),
                "region": str(rng.choice(_REGIONS)),
                # 5% of entities have a second address (address-split refinement)
                "has_second_addr": bool(rng.random() < 0.05),
            }
        )
    return pd.DataFrame(rows)


def _corrupt_name(rng: np.random.Generator, name: str) -> str:
    """Apply the FIXTURES.md §4 corruption model to one mention."""
    tokens = name.split()
    r = rng.random
    if len(tokens) > 1 and r() < 0.15:  # token reorder (sorted-fingerprint test)
        perm = rng.permutation(len(tokens))
        tokens = [tokens[i] for i in perm]
    if r() < 0.10:  # abbreviation swap
        tokens = [_ABBREV.get(t, t) for t in tokens]
    if len(tokens) >= 3 and r() < 0.10:  # dropped middle token ((n-1)-combos)
        tokens = tokens[:1] + tokens[2:]
    if r() < 0.08:  # metaphone-preserving vowel misspelling
        idx = int(rng.integers(0, len(tokens)))
        t = tokens[idx]
        pos = [i for i, ch in enumerate(t[1:], 1) if ch in _VOWELS]
        if pos:
            i = int(rng.choice(pos))
            repl = "Y" if t[i] == "I" else _VOWELS[int(rng.integers(0, 5))]
            tokens[idx] = t[:i] + repl + t[i + 1 :]
    if r() < 0.03:  # metaphone-BREAKING consonant typo (similarity stage)
        idx = int(rng.integers(0, len(tokens)))
        t = tokens[idx]
        if len(t) > 2:
            i = int(rng.integers(1, len(t)))
            tokens[idx] = t[:i] + "X" + t[i:]
    if r() < 0.05:  # unicode accent (NFKD fold exercise)
        idx = int(rng.integers(0, len(tokens)))
        t = tokens[idx]
        for i, ch in enumerate(t):
            if ch in _ACCENT:
                tokens[idx] = t[:i] + _ACCENT[ch] + t[i + 1 :]
                break
    out = " ".join(tokens)
    if r() < 0.08:  # title noise (NameCleaner exercise)
        out = rng.choice(["MR. ", "MS. ", "DR. "]) + out
    return out


def generate_web_pages(
    n_pages: int = 2000,
    n_entities: int | None = None,
    seed: int = 42,
    mega_fraction: float = 0.05,
) -> tuple[pd.DataFrame, pd.DataFrame]:
    """Return (web_pages, pages_truth).

    web_pages: url, warc_ts, html(bytes), text, lang
    pages_truth: url, entity_id, own_class, owner1_mention, owner2_mention,
                 comb fields + canonical entity columns (diagnostics only —
                 official ground truth for F1 is the oracle fixpoint,
                 SURVEY.md §7.4.1).
    """
    if n_entities is None:
        n_entities = max(20, n_pages // 12)
    rng = np.random.default_rng(seed)
    entities = _make_entities(rng, n_entities)

    # Zipfian entity pick over non-mega entities; mega-entity gets a fixed slice.
    n_mega = int(n_pages * mega_fraction)
    zipf_w = 1.0 / np.arange(1, n_entities)  # entity 1..n-1
    zipf_w /= zipf_w.sum()
    picks = np.concatenate(
        [
            np.zeros(n_mega, dtype=np.int64),
            rng.choice(np.arange(1, n_entities), size=n_pages - n_mega, p=zipf_w),
        ]
    )
    rng.shuffle(picks)

    langs = rng.choice(["en", "de", "es"], size=n_pages, p=[0.96, 0.02, 0.02])

    page_rows = []
    truth_rows = []
    ent = entities.set_index("entity_id")
    for seq in range(n_pages):
        eid = int(picks[seq])
        e = ent.loc[eid]
        o1 = _corrupt_name(rng, e["owner1"]) if e["own_class"] != CLASS_UNKNOWN else e["owner1"]
        o2 = _corrupt_name(rng, e["owner2"]) if e["owner2"] else ""
        if e["own_class"] == CLASS_FAMILY and rng.random() < 0.05:
            o1 = o1 + " JR"
        # address: second address for flagged entities on ~40% of their pages
        addr_num = e["addr_num"]
        if e["has_second_addr"] and rng.random() < 0.4:
            addr_num = str(int(addr_num) + 10000)
        # 'nan' artifact: some predirs render as literal nan (reference quirk)
        predir = e["addr_predir"]
        if predir == "" and rng.random() < 0.5:
            predir = "nan"
        care_of = f"C/O {rng.choice(_GIVEN)} {rng.choice(_SURNAMES)}" if rng.random() < 0.10 else ""
        filler = " ".join(rng.choice(_FILLER, size=8))

        url = f"https://records.example.org/{e['region'].lower()}/parcel/{seq:09d}"
        lines = [
            f"OWNERSHIP RECORD {seq:09d}",
            f"OWNER: {o1}",
            f"CO-OWNER: {o2}",
            f"CARE OF: {care_of}",
            # single-spaced from non-empty parts: an empty predir must not
            # leave a double space (the \S+-based mention parser would then
            # null the street/mode and split families on address form)
            "ADDRESS: " + " ".join(
                p for p in (addr_num, predir, e["addr_street"], e["addr_mode"]) if p
            ),
            f"REGION: {e['region']}",
            f"NOTES: {filler}",
        ]
        text = "\n".join(lines)
        body = "".join(f"<p>{html_mod.escape(line)}</p>" for line in lines)
        page_html = (
            f'<html><head><meta charset="utf-8"><title>Parcel {seq:09d}</title></head>'
            f"<body>{body}</body></html>"
        ).encode("utf-8")

        page_rows.append(
            {
                "url": url,
                "warc_ts": _EPOCH + timedelta(seconds=int(seq) * 7),
                "html": page_html,
                "text": text,
                "lang": str(langs[seq]),
            }
        )
        truth_rows.append(
            {
                "url": url,
                "entity_id": eid,
                "own_class": int(e["own_class"]),
                "owner1_mention": o1,
                "owner2_mention": o2,
                "addr_num": addr_num,
                "addr_predir": predir,
                "addr_street": e["addr_street"],
                "addr_mode": e["addr_mode"],
                "region": e["region"],
            }
        )

    return pd.DataFrame(page_rows), pd.DataFrame(truth_rows)
