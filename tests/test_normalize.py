"""Normalization + key-generation parity: Spark vs the pure-Python oracle
(exact reference semantics, `Classify_Unknowns_opt.py:159-196`,
`Name_Matching_opt.py:64-69,100-106`)."""

import pandas as pd
from pyspark.sql import functions as F

from fia_own_map_spark.functions.combos import (
    metaphone_keys_py,
    normalized_name_keys,
    token_combinations_py,
)
from fia_own_map_spark.functions.normalize import (
    combine_addr,
    nfkd_ascii,
    normalize_name,
    normalize_name_py,
    tokens_from_normalized,
)

CASES = [
    ("JOHN SMITH", "MARY SMITH"),
    ("josé GONZÁLEZ", None),
    ("MR. WM JOHNSON JR", ""),
    ("CASCADE HOLDINGS LLC", None),
    ("A B SINGLE LETTERS C", "X"),
    ("  spaced   out   name ", None),
    (None, None),
    ("O'BRIEN & SONS, LTD.", "TRUSTEE TTEE"),
    ("ÉLODIE MÜLLER", "ÑOÑO"),
]


def test_nfkd_ascii_exact_semantics():
    # mirrors Classify_Unknowns_opt.py:159-163 byte-for-byte
    assert nfkd_ascii("José  GONZÁLEZ!") == "Jose GONZALEZ"
    # em-dash is non-decomposable: dropped by the ASCII encode step *before*
    # the punctuation->space pass (order matters in the reference)
    assert nfkd_ascii("A—B–C") == "ABC"
    assert nfkd_ascii("A-B-C") == "A B C"
    assert nfkd_ascii("  x  ") == "x"
    assert nfkd_ascii("ña 42") == "na 42"


def test_normalize_spark_matches_oracle(spark):
    pdf = pd.DataFrame(CASES, columns=["owner1", "owner2"])
    sdf = spark.createDataFrame(pdf)
    got = (
        sdf.withColumn("simple_owners", normalize_name("owner1", "owner2"))
        .select("simple_owners")
        .toPandas()["simple_owners"]
        .tolist()
    )
    want = [normalize_name_py(o1, o2) for o1, o2 in CASES]
    assert got == want


def test_token_combinations_semantics():
    assert token_combinations_py(["A", "B"]) == [("A", "B")]
    assert token_combinations_py(["A", "B", "C"]) == [
        ("A", "B", "C"),
        ("A", "B"),
        ("A", "C"),
        ("B", "C"),
    ]


def test_spark_fingerprints_match_oracle(spark):
    pdf = pd.DataFrame(CASES, columns=["owner1", "owner2"])
    sdf = spark.createDataFrame(pdf)
    sdf = sdf.withColumn("simple_owners", normalize_name("owner1", "owner2"))
    sdf = sdf.withColumn("tokens", tokens_from_normalized("simple_owners"))
    sdf = sdf.withColumn("name_keys", normalized_name_keys("tokens"))
    rows = sdf.select("simple_owners", "name_keys").toPandas()
    for owners, keys in zip(rows["simple_owners"], rows["name_keys"]):
        toks = owners.split(" ") if owners else []
        want_fps = []
        seen = set()
        for comb in token_combinations_py(toks):
            fp = "".join(sorted(comb)).upper()
            if fp and fp not in seen:
                seen.add(fp)
                want_fps.append(fp)
        assert sorted(keys) == sorted(want_fps)


def test_metaphone_keys_py_reorder_invariance():
    # sorted-token fingerprint defeats token reordering (NM:64-65)
    assert metaphone_keys_py(["JOHN", "SMITH"]) == metaphone_keys_py(["SMITH", "JOHN"])


def test_combine_addr_nan_scrub(spark):
    # Name_Matching_opt.py:131-132 — str(NaN)='nan' runs are scrubbed
    pdf = pd.DataFrame(
        [("12", None, "MAPLE", "ST"), (None, None, None, None)],
        columns=["n", "p", "s", "m"],
    )
    sdf = spark.createDataFrame(pdf)
    got = (
        sdf.select(combine_addr("n", "p", "s", "m").alias("a"))
        .toPandas()["a"]
        .tolist()
    )
    assert got[0] == "12  MAPLE ST"
    assert got[1] == "   "
