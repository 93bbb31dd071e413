"""Eval-set decontamination: mirror parity, removal semantics, plan shape."""
import pytest
from pyspark.sql import functions as F

from fia_own_map_spark.operators.decontam import (
    contamination_py,
    contamination_report,
    decontaminate,
)

EVAL = {
    100: "the quick brown fox jumps over the lazy dog tonight",
    101: "pack my box with five dozen liquor jugs right now",
}
TRAIN = {
    0: "something about the quick brown fox jumps over the lazy dog tonight ok",
    1: "totally clean document with its own words and nothing borrowed at all",
    2: "PACK my Box with five dozen liquor jugs right now and more",  # case/ws
    3: None,
    4: "short doc",  # < k tokens: cannot be contaminated
    5: "the quick brown fox jumps over the lazy dog tonight "
       "pack my box with five dozen liquor jugs right now",  # hits BOTH
}


@pytest.fixture()
def frames(spark):
    train = spark.createDataFrame(
        [(i, t) for i, t in TRAIN.items()], "doc_id long, text string"
    )
    ev = spark.createDataFrame(
        [(i, t) for i, t in EVAL.items()], "doc_id long, text string"
    )
    return train, ev


def test_mirror_parity(frames):
    train, ev = frames
    got = {
        r["doc_id"]: (r["n_shared_shingles"], r["n_eval_docs_hit"],
                      r["contaminated"])
        for r in contamination_report(train, ev, k=8).collect()
    }
    assert got == contamination_py(TRAIN, EVAL, k=8)
    assert got[0][2] and got[2][2] and got[5][2]
    assert not got[1][2] and not got[3][2] and not got[4][2]
    assert got[5][1] == 2  # overlaps both eval docs


def test_string_and_hashed_paths_agree(frames):
    train, ev = frames
    a = {r["doc_id"]: r["contaminated"]
         for r in contamination_report(train, ev, k=8,
                                       hash_shingles=True).collect()}
    b = {r["doc_id"]: r["contaminated"]
         for r in contamination_report(train, ev, k=8,
                                       hash_shingles=False).collect()}
    assert a == b


def test_decontaminate_removes_exactly_the_flagged(frames):
    train, ev = frames
    kept = {r["doc_id"] for r in decontaminate(train, ev, k=8).collect()}
    flagged = {
        r["doc_id"]
        for r in contamination_report(train, ev, k=8).collect()
        if r["contaminated"]
    }
    assert kept == set(TRAIN) - flagged
    assert kept == {1, 3, 4}


def test_plan_shape(frames):
    import io
    from contextlib import redirect_stdout

    train, ev = frames
    buf = io.StringIO()
    with redirect_stdout(buf):
        contamination_report(train, ev, k=8).explain()
    plan = buf.getvalue()
    assert "Window" not in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_sf001_split_mirror_parity(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    ev = docs.filter(F.col("doc_id") % 50 == 0)
    train = docs.filter(F.col("doc_id") % 50 != 0)
    got = {
        r["doc_id"]: (r["n_shared_shingles"], r["n_eval_docs_hit"],
                      r["contaminated"])
        for r in contamination_report(train, ev, k=8).collect()
    }
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    ev_t = {i: t for i, t in texts.items() if i % 50 == 0}
    tr_t = {i: t for i, t in texts.items() if i % 50 != 0}
    assert got == contamination_py(tr_t, ev_t, k=8)
    assert len(got) == len(tr_t)
