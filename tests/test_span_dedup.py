"""Substring-level (duplicated-span) dedup — Lee et al. 2022 style.

The distributed re-expression (k-gram shingle counts -> semi join back ->
per-doc interval merge) is value-checked two ways: a hand-built corpus with
known maximal spans, and a DuckDB oracle on the sf0.001 documents table
(gaps-and-islands SQL reproduces the Catalyst fold's merge semantics).
"""
import duckdb
import pytest

from fia_own_map_spark.operators.dedup import (
    duplicated_spans,
    remove_duplicated_spans,
    span_dedup_stats,
)

SF = "/root/testdata/sf0.001"
K = 8

STATS_ORACLE_SQL = r"""
WITH toks AS (
  SELECT doc_id, text,
         string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS t
  FROM documents
),
occ AS (
  SELECT doc_id, u.i - 1 AS pos, array_to_string(t[u.i : u.i + 7], ' ') AS sh
  FROM toks, UNNEST(range(1, len(t) - 6)) AS u(i)
  WHERE len(t) >= 8
),
dups AS (SELECT sh FROM occ GROUP BY sh HAVING count(*) >= 2),
hits AS (SELECT occ.doc_id, occ.pos FROM occ JOIN dups USING (sh)),
brk AS (
  SELECT doc_id, pos,
         CASE WHEN pos <= COALESCE(MAX(pos) OVER w, -100000000) + 8
              THEN 0 ELSE 1 END AS b
  FROM hits
  WINDOW w AS (PARTITION BY doc_id ORDER BY pos
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
),
isl AS (SELECT doc_id, pos, SUM(b) OVER (PARTITION BY doc_id ORDER BY pos) AS g
        FROM brk),
spans AS (SELECT doc_id, MIN(pos) AS s, MAX(pos) + 8 AS e
          FROM isl GROUP BY doc_id, g),
perdoc AS (SELECT doc_id, SUM(e - s) AS dup_tokens, COUNT(*) AS n_spans
           FROM spans GROUP BY doc_id)
SELECT d.doc_id,
       CASE WHEN d.text IS NULL THEN 0
            ELSE len(string_split(trim(regexp_replace(lower(d.text),
                                          '\s+', ' ', 'g')), ' '))
       END AS n_tokens,
       COALESCE(p.dup_tokens, 0) AS dup_tokens,
       COALESCE(p.n_spans, 0) AS n_spans,
       ROUND(CASE WHEN n_tokens > 0
                  THEN COALESCE(p.dup_tokens, 0)::DOUBLE / n_tokens
                  ELSE 0.0 END, 6) AS dup_frac
FROM documents d LEFT JOIN perdoc p USING (doc_id)
ORDER BY doc_id
"""


@pytest.fixture()
def corpus(spark):
    rows = [
        (0, "A b c d e f g h X1"),                       # shared 8-gram at [0,8)
        (1, "z1 z2 a b c d e f g h z3"),                  # same 8-gram at [2,10)
        (2, "totally unique words nothing repeats here at all ever once"),
        (3, "p q r s t u v w p q r s t u v w"),           # self-repeat -> [0,16)
        (4, None),                                          # NULL text
        (5, "short text"),                                  # < k tokens
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_duplicated_spans_hand_case(corpus):
    got = sorted(
        (r["doc_id"], r["span_start"], r["span_end"])
        for r in duplicated_spans(corpus, k=K).collect()
    )
    assert got == [(0, 0, 8), (1, 2, 10), (3, 0, 16)]


def test_span_stats_hand_case(corpus):
    got = {
        r["doc_id"]: (r["n_tokens"], r["dup_tokens"], r["n_spans"], r["dup_frac"])
        for r in span_dedup_stats(corpus, k=K).collect()
    }
    assert got[0] == (9, 8, 1, round(8 / 9, 6))
    assert got[1] == (11, 8, 1, round(8 / 11, 6))
    assert got[2] == (10, 0, 0, 0.0)
    assert got[3] == (16, 16, 1, 1.0)   # fully duplicated document
    assert got[4] == (0, 0, 0, 0.0)     # NULL text
    assert got[5] == (2, 0, 0, 0.0)     # shorter than k: undetectable by design


def test_remove_spans_hand_case(corpus):
    got = {r["doc_id"]: r["clean_text"]
           for r in remove_duplicated_spans(corpus, k=K).collect()}
    assert got[0] == "x1"               # normalized (lowercased) text minus span
    assert got[1] == "z1 z2 z3"
    assert got[3] == ""                 # every token was duplicated
    assert got[4] is None               # NULL stays NULL
    assert got[5] == "short text"       # untouched


def test_remove_consistent_with_stats(corpus):
    """Tokens removed per doc == dup_tokens reported by the stats op."""
    stats = {r["doc_id"]: r for r in span_dedup_stats(corpus, k=K).collect()}
    for r in remove_duplicated_spans(corpus, k=K).collect():
        if r["clean_text"] is None:
            assert stats[r["doc_id"]]["n_tokens"] == 0
            continue
        kept = len(r["clean_text"].split(" ")) if r["clean_text"] else 0
        s = stats[r["doc_id"]]
        assert s["n_tokens"] - kept == s["dup_tokens"]


def test_span_stats_duckdb_oracle_sf001(spark):
    """Production path (xxhash64 shingle keys) vs a string-keyed DuckDB
    gaps-and-islands oracle on the sf0.001 documents table — exact rows."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    got = sorted(
        (r["doc_id"], r["n_tokens"], r["dup_tokens"], r["n_spans"], r["dup_frac"])
        for r in span_dedup_stats(docs, k=K).collect()
    )
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    want = [tuple(r) for r in con.execute(STATS_ORACLE_SQL).fetchall()]
    assert len(got) == 500
    assert sum(1 for r in got if r[3] > 0) > 0  # corpus really has dup spans
    assert got == want


def test_span_stats_plan_discipline(spark):
    """The 100 TB shape: xxhash64 keys on the count shuffle, map-side
    partial count, interval merge as a Catalyst fold (NO window — the
    DuckDB oracle's gaps-and-islands window is the single-machine idiom,
    not the distributed one), no python eval, no cartesian product."""
    import io
    from contextlib import redirect_stdout

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    df = span_dedup_stats(docs, k=K)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
        df.explain()
    plan = buf.getvalue()
    assert "xxhash64" in plan
    assert "partial_count" in plan or "count" in plan
    assert "Window" not in plan
    assert "CartesianProduct" not in plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
