"""Pairwise string-similarity measures for the scoring stage (north_star:
"vectorized pandas/Arrow UDFs computing batched Jaro-Winkler, Levenshtein,
and token-set-Jaccard").

Production path: ``similarity_scores`` — ONE fused Arrow-batched pandas UDF
returning struct<jw, lev_ratio, jaccard>, all three measures computed in the
vectorized Python kernel per batch:

  * Jaro-Winkler — numpy batch kernel (``jaro_winkler_batch``): pairs packed
    into padded uint8/uint32 codepoint matrices; the greedy match /
    transposition passes run as elementwise ops across the whole chunk.
    Bitwise-identical to the scalar reference (``jaro_winkler``), fuzz-tested.
  * Levenshtein — numpy batch Wagner-Fischer (``levenshtein_batch``) with the
    intra-row dependency resolved as a prefix-min scan; exact integer
    distances (same as ``F.levenshtein`` / DuckDB).
  * token-set Jaccard — per-row set ops with F.split semantics.

Why fused + python-side: the earlier JVM mix (built-in levenshtein +
array_intersect/union Jaccard + a separate JW UDF) needed three passes and
the JVM array ops allocation-bound at high core counts (measured 8->32
scaling efficiency 0.28); one Arrow round-trip scoring each batch
independently is shuffle-free and embarrassingly parallel. Chunks are sized
(1024) so each worker's DP/match buffers stay cache-resident instead of
contending for DRAM bandwidth. Standalone ``jaro_winkler_sim`` /
``levenshtein_ratio`` / ``token_set_jaccard`` Columns remain for composition
and oracle parity tests.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType, StructField, StructType


# ---------------------------------------------------------------------------
# Pure-Python Jaro-Winkler (shared with the pandas test oracle)
# ---------------------------------------------------------------------------
def jaro(s1: str, s2: str) -> float:
    len1, len2 = len(s1), len(s2)
    # empty-before-equality: jaro('','') == 0.0 (strcmp95/DuckDB convention)
    if len1 == 0 or len2 == 0:
        return 0.0
    if s1 == s2:
        return 1.0
    match_window = max(len1, len2) // 2 - 1
    if match_window < 0:
        match_window = 0
    flags1 = [False] * len1
    flags2 = [False] * len2
    matches = 0
    for i, ch in enumerate(s1):
        lo = max(0, i - match_window)
        hi = min(len2, i + match_window + 1)
        for j in range(lo, hi):
            if not flags2[j] and s2[j] == ch:
                flags1[i] = True
                flags2[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    transpositions = 0
    j = 0
    for i in range(len1):
        if flags1[i]:
            while not flags2[j]:
                j += 1
            if s1[i] != s2[j]:
                transpositions += 1
            j += 1
    # strcmp95 / DuckDB convention: transpositions are integer-halved
    t = transpositions // 2
    m = matches
    return (m / len1 + m / len2 + (m - t) / m) / 3.0


def jaro_winkler(
    s1: str, s2: str, prefix_scale: float = 0.1, boost_threshold: float = 0.7
) -> float:
    """Jaro similarity boosted by common-prefix length (max 4) when Jaro
    exceeds the boost threshold — the canonical Winkler (strcmp95)
    definition, verified bit-for-bit against DuckDB's
    jaro_winkler_similarity by fuzzing (tools/verify_contract.py)."""
    j = jaro(s1, s2)
    if j <= boost_threshold:
        return j
    prefix = 0
    for a, b in zip(s1[:4], s2[:4]):
        if a == b:
            prefix += 1
        else:
            break
    return j + prefix * prefix_scale * (1.0 - j)


# ---------------------------------------------------------------------------
# numpy-vectorized batch Jaro-Winkler (the production kernel)
# ---------------------------------------------------------------------------
def _codes(strs: np.ndarray, width: int) -> np.ndarray:
    """(B, width) uint32 codepoint matrix, zero-padded."""
    buf = np.zeros(len(strs), dtype=f"<U{width}")
    buf[:] = strs
    return buf.view(np.uint32).reshape(len(strs), width)


def _jw_chunk(
    s1: np.ndarray,
    s2: np.ndarray,
    n1: np.ndarray,
    n2: np.ndarray,
    prefix_scale: float,
    boost_threshold: float,
) -> np.ndarray:
    """Vectorized JW over one chunk of string pairs (object arrays, no nulls).

    Same greedy match / integer-halved transposition / prefix-boost semantics
    as the scalar ``jaro_winkler`` (strcmp95/DuckDB conventions), computed
    with the identical float64 operation order so results are bitwise equal.

    The matching pass needs no explicit validity masks: pad positions are
    codepoint 0, which never equals a real character, and the window bound
    ``j < min(n2, i+w+1)`` already excludes s2's padding.
    """
    nrows = len(s1)
    l1, l2 = max(int(n1.max()), 1), max(int(n2.max()), 1)
    a = _codes(s1, l1)
    b = _codes(s2, l2)
    if int(a.max(initial=0)) < 256 and int(b.max(initial=0)) < 256:
        a, b = a.astype(np.uint8), b.astype(np.uint8)  # 4x less compare traffic

    w = np.maximum(np.maximum(n1, n2) // 2 - 1, 0)
    flags1 = np.zeros((nrows, l1), dtype=bool)
    unflagged2 = np.ones((nrows, l2), dtype=bool)
    j_idx = np.arange(l2)
    rows = np.arange(nrows)
    cand = np.empty((nrows, l2), dtype=bool)
    tmp = np.empty((nrows, l2), dtype=bool)
    hi0 = np.minimum(n2, w + 1)
    for i in range(l1):
        np.equal(b, a[:, i][:, None], out=cand)
        np.less(j_idx, np.minimum(n2, hi0 + i)[:, None], out=tmp)
        cand &= tmp
        np.greater_equal(j_idx, (i - w)[:, None], out=tmp)
        cand &= tmp
        cand &= unflagged2
        first = cand.argmax(axis=1)
        has = cand[rows, first]
        flags1[:, i] = has
        unflagged2[has, first[has]] = False

    flags2 = ~unflagged2
    m = flags1.sum(axis=1)

    # transpositions: matched chars of s1 in i-order vs matched of s2 in j-order
    k = min(l1, l2)
    m1 = np.zeros((nrows, k), dtype=a.dtype)
    m2 = np.zeros((nrows, k), dtype=a.dtype)
    r1 = np.cumsum(flags1, axis=1) - 1
    rows, cols = np.nonzero(flags1)
    m1[rows, r1[rows, cols]] = a[rows, cols]
    r2 = np.cumsum(flags2, axis=1) - 1
    rows, cols = np.nonzero(flags2)
    m2[rows, r2[rows, cols]] = b[rows, cols]
    pos = np.arange(k)
    trans = ((m1 != m2) & (pos < m[:, None])).sum(axis=1)
    t = trans // 2

    md = np.maximum(m, 1)  # guarded denominator; m==0 rows are masked below
    j = (m / np.maximum(n1, 1) + m / np.maximum(n2, 1) + (m - t) / md) / 3.0
    j = np.where((m == 0) | (n1 == 0) | (n2 == 0), 0.0, j)

    # Winkler prefix boost (common prefix up to 4, only when jaro > threshold)
    p4 = min(4, k)
    valid = (pos[:p4] < n1[:, None]) & (pos[:p4] < n2[:, None])
    eq = (a[:, :p4] == b[:, :p4]) & valid
    prefix = np.cumprod(eq, axis=1).sum(axis=1)
    return np.where(j > boost_threshold, j + prefix * prefix_scale * (1.0 - j), j)


def jaro_winkler_batch(
    a: np.ndarray,
    b: np.ndarray,
    prefix_scale: float = 0.1,
    boost_threshold: float = 0.7,
    chunk: int = 1024,
) -> np.ndarray:
    """Batched Jaro-Winkler over object arrays of strings (None -> NaN).

    Pairs are ordered by max length and processed in chunks so the padded
    matrices stay tight (one long outlier string doesn't inflate every row).
    """
    n = len(a)
    out = np.full(n, np.nan)
    valid = ~(pd.isna(a) | pd.isna(b))
    if not valid.any():
        return out
    va, vb = a[valid], b[valid]
    nv = len(va)
    n1 = np.fromiter(map(len, va), dtype=np.int64, count=nv)
    n2 = np.fromiter(map(len, vb), dtype=np.int64, count=nv)
    res = np.empty(nv)
    # fast path: identical strings score exactly 1.0 (0.0 for ''=='' — the
    # strcmp95 empty convention); blocked candidate pairs repeat names
    # heavily, so this commonly covers half the batch
    eq = va == vb
    res[eq] = np.where(n1[eq] > 0, 1.0, 0.0)
    ne = ~eq
    if ne.any():
        va, vb, n1n, n2n = va[ne], vb[ne], n1[ne], n2[ne]
        sub = np.empty(len(va))
        order = np.argsort(np.maximum(n1n, n2n), kind="stable")
        for s in range(0, len(va), chunk):
            idx = order[s : s + chunk]
            sub[idx] = _jw_chunk(
                va[idx], vb[idx], n1n[idx], n2n[idx], prefix_scale, boost_threshold
            )
        res[ne] = sub
    out[valid] = res
    return out


@pandas_udf(DoubleType())
def _jw_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    return pd.Series(
        jaro_winkler_batch(a.to_numpy(dtype=object), b.to_numpy(dtype=object)),
        dtype="float64",
    )


# ---------------------------------------------------------------------------
# numpy-vectorized batch Levenshtein
# ---------------------------------------------------------------------------
def _lev_chunk(s1: np.ndarray, s2: np.ndarray, n1: np.ndarray, n2: np.ndarray) -> np.ndarray:
    """Edit distances for one chunk. Wagner-Fischer with the intra-row
    dependency resolved as a prefix-min scan (cur[j] = j + running_min(t-j)),
    so each DP row is pure elementwise numpy across the whole chunk.

    Pairs must be oriented so len(s1) >= len(s2) (callers do this): the loop
    runs over the longer string, the vectorized row is the shorter one.
    """
    nrows = len(s1)
    l1, l2 = max(int(n1.max()), 1), max(int(n2.max()), 1)
    a = _codes(s1, l1)
    b = _codes(s2, l2)
    if int(a.max(initial=0)) < 256 and int(b.max(initial=0)) < 256:
        a, b = a.astype(np.uint8), b.astype(np.uint8)

    dt = np.int16 if l1 < 30000 else np.int32  # dist <= l1; less DP traffic
    js = np.arange(l2 + 1, dtype=dt)
    prev = np.broadcast_to(js, (nrows, l2 + 1)).astype(dt).copy()
    d = np.empty((nrows, l2 + 1), dtype=dt)
    rows = np.arange(nrows)
    res = np.empty(nrows, dtype=np.int64)
    done0 = n1 == 0
    res[done0] = n2[done0]
    for i in range(1, l1 + 1):
        cost = b != a[:, i - 1][:, None]
        # t[j] = min(prev[j+1] + 1, prev[j] + cost[j])  (candidates, no intra-row dep)
        t = np.minimum(prev[:, 1:] + 1, prev[:, :-1] + cost)
        # cur[j] = min over k<=j of (base[k] + j - k); base = [i, t...]
        d[:, 0] = i
        d[:, 1:] = t - js[1:]
        np.minimum.accumulate(d, axis=1, out=d)
        cur = d + js
        fin = n1 == i
        if fin.any():
            res[fin] = cur[fin, n2[fin]]
        prev, d = cur, prev  # reuse the old prev buffer as next d
    return res


def levenshtein_batch(a: np.ndarray, b: np.ndarray, chunk: int = 1024) -> np.ndarray:
    """Batched edit distance over object arrays (no nulls), float64 out.

    Orients each pair longer-first (symmetric metric) so the vectorized DP
    row is the shorter string, and chunks by longer-length to keep the
    padded matrices tight.
    """
    n = len(a)
    res = np.zeros(n, dtype=np.int64)
    ne = a != b  # identical strings have distance 0 — common in blocked pairs
    if not ne.any():
        return res
    a, b = a[ne], b[ne]
    m = len(a)
    la = np.fromiter(map(len, a), dtype=np.int64, count=m)
    lb = np.fromiter(map(len, b), dtype=np.int64, count=m)
    swap = lb > la
    if swap.any():
        a, b = a.copy(), b.copy()
        a[swap], b[swap] = b[swap], a[swap]
        la, lb = np.maximum(la, lb), np.minimum(la, lb)
    order = np.argsort(la, kind="stable")
    sub = np.empty(m, dtype=np.int64)
    for s in range(0, m, chunk):
        idx = order[s : s + chunk]
        sub[idx] = _lev_chunk(a[idx], b[idx], la[idx], lb[idx])
    res[ne] = sub
    return res


def _jaccard_tokens_py(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Token-set Jaccard with F.split(name, ' ') semantics: split on single
    spaces (empty tokens kept), set intersection/union — exactly Spark's
    array_intersect/array_union distinct semantics."""
    n = len(a)
    out = np.empty(n)
    for i in range(n):
        x, y = a[i], b[i]
        if x == y:  # identical strings -> identical token sets -> exactly 1.0
            out[i] = 1.0
            continue
        sa, sb = set(x.split(" ")), set(y.split(" "))
        u = len(sa | sb)
        out[i] = 1.0 if u == 0 else len(sa & sb) / u
    return out


def similarity_scores_batch(a: np.ndarray, b: np.ndarray) -> pd.DataFrame:
    """All three scores for a batch of string pairs (object arrays; None ->
    null row): columns (jw, lev_ratio, jaccard). One pass over the data —
    this is the fused production scoring kernel."""
    n = len(a)
    jw = np.full(n, np.nan)
    lev_ratio = np.full(n, np.nan)
    jac = np.full(n, np.nan)
    valid = ~(pd.isna(a) | pd.isna(b))
    if valid.any():
        va, vb = a[valid], b[valid]
        jw[valid] = jaro_winkler_batch(va, vb)
        dist = levenshtein_batch(va, vb)
        mx = np.maximum(
            np.fromiter(map(len, va), dtype=np.int64, count=len(va)),
            np.fromiter(map(len, vb), dtype=np.int64, count=len(vb)),
        )
        lev_ratio[valid] = np.where(mx == 0, 1.0, 1.0 - dist / np.maximum(mx, 1))
        jac[valid] = _jaccard_tokens_py(va, vb)
    return pd.DataFrame({"jw": jw, "lev_ratio": lev_ratio, "jaccard": jac})


_SCORES_TYPE = StructType(
    [
        StructField("jw", DoubleType()),
        StructField("lev_ratio", DoubleType()),
        StructField("jaccard", DoubleType()),
    ]
)


@pandas_udf(_SCORES_TYPE)
def _scores_udf(a: pd.Series, b: pd.Series) -> pd.DataFrame:
    return similarity_scores_batch(a.to_numpy(dtype=object), b.to_numpy(dtype=object))


def similarity_scores(a: Column | str, b: Column | str, fast: bool = True) -> Column:
    """struct<jw, lev_ratio, jaccard> — one fused Arrow round-trip computing
    all three measures in the vectorized Python kernel. This is the scale
    path: a single UDF pass is embarrassingly parallel and avoids the
    allocation-heavy JVM array ops (array_intersect/union) that GC-bind at
    high core counts.

    fast=True (production default) adds a JVM-side equality fast path:
    identical pairs — about half of all blocked candidates — get literal
    scores (jw = 1.0 unless empty, per strcmp95 empty-before-equality;
    lev_ratio = jaccard = 1.0, matching the python kernel's own equality
    branches bit-for-bit) and their UDF inputs are MASKED TO NULL, so no
    string bytes cross the Arrow pipe for them and the python kernel only
    materializes the hard rows. Measured effect: the pipe is the one
    non-scaling cost at high core counts (a trivial pass-through UDF scales
    only 1.4x from 8 to 32 cores while the numpy compute scales 4x), so
    halving pipe traffic is what keeps the whole operator near-linear.
    Null inputs take the UDF path (null-unsafe ==) and yield null scores
    either way. fast=False keeps the pure-UDF single expression for parity
    tests."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    if not fast:
        return _scores_udf(ca, cb)
    eq = ca == cb  # null-unsafe: null rows fall to otherwise() = UDF path
    null_s = F.lit(None).cast("string")
    masked = _scores_udf(
        F.when(eq, null_s).otherwise(ca), F.when(eq, null_s).otherwise(cb)
    )
    eq_scores = F.struct(
        F.when(F.length(ca) > 0, F.lit(1.0)).otherwise(F.lit(0.0)).alias("jw"),
        F.lit(1.0).alias("lev_ratio"),
        F.lit(1.0).alias("jaccard"),
    )
    return F.when(eq, eq_scores).otherwise(masked)


def jaro_winkler_sim(a: Column | str, b: Column | str) -> Column:
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    return _jw_udf(ca, cb)


def levenshtein_ratio(a: Column | str, b: Column | str) -> Column:
    """1 - lev(a,b)/max(len) — JVM-side (built-in levenshtein)."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    max_len = F.greatest(F.length(ca), F.length(cb))
    return F.when(max_len == 0, F.lit(1.0)).otherwise(
        1.0 - F.levenshtein(ca, cb) / max_len.cast("double")
    )


def token_set_jaccard(a: Column | str, b: Column | str) -> Column:
    """|A ∩ B| / |A ∪ B| over token arrays — fully native (no UDF)."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    inter = F.size(F.array_intersect(ca, cb))
    union = F.size(F.array_union(ca, cb))
    return F.when(union == 0, F.lit(1.0)).otherwise(
        inter.cast("double") / union.cast("double")
    )


def levenshtein_ratio_py(s1: str, s2: str) -> float:
    """Oracle mirror of levenshtein_ratio."""
    if s1 == s2:
        return 1.0
    if not s1 or not s2:
        return 0.0 if (s1 or s2) else 1.0
    prev = list(range(len(s2) + 1))
    for i, c1 in enumerate(s1, 1):
        cur = [i]
        for j, c2 in enumerate(s2, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (c1 != c2)))
        prev = cur
    return 1.0 - prev[-1] / max(len(s1), len(s2))


def token_set_jaccard_py(a: list[str], b: list[str]) -> float:
    sa, sb = set(a), set(b)
    union = sa | sb
    if not union:
        return 1.0
    return len(sa & sb) / len(union)
