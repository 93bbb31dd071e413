"""Distributed sketches over ``xxhash64``: HyperLogLog cardinality,
Count-Min frequency, Bloom membership.

At 100 TB, ``COUNT(DISTINCT)`` is the classic scale-killer: exact distinct
forces a full shuffle of every raw value. The standard fix is a mergeable
register sketch — HyperLogLog (Flajolet et al. 2007, and the HLL++ 64-bit
variant in Heule et al. 2013) — whose per-group state is ``m = 2**p`` tiny
integers regardless of input size, built with a map-side partial ``max``
(one shuffle of at most ``groups x m`` slim rows), mergeable across
partitions, days, and incremental batches by bucket-wise ``max``.

Spark ships ``approx_count_distinct`` (its own HLL++ with engine-private
register encoding); this operator exists because a training-data pipeline
needs the STATE, not just the scalar: persistable register tables that
merge across ingest batches (`hll_merge`) and a hash contract
(``F.xxhash64``, seed 42) reproducible outside the JVM — the DuckDB
oracle rebuilds the identical registers and estimate in pure SQL via
``testing/xxh64_sql.hash_long_steps``, so the whole sketch is
value-checked, not rows-only (`__spark_entry__._hll_oracle_sql`).

Everything is native Catalyst exprs (no UDF): hash, top-``p``-bit bucket,
leading-zero rank via ``length(bin(w))``, and an EXACT integer-scaled
denominator — ``zeros * 2**R + sum(2**(R - maxrank))`` summed in
``decimal(38,0)`` — so the estimate never depends on floating-point
summation order (doubles of mixed magnitude do not add associatively;
integer register sums do). The only doubles are one final division and
the alpha constant, identical literals on both engines.

Reference scope note: the reference engine has no sketches at all — this
is part of the beyond-reference LLM-pipeline surface (builder brief), in
the same family as dedup/ANN.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# Bias-correction constant alpha_m (Flajolet et al. 2007, Fig. 3): exact
# published literals below m=128, the closed form above.
_ALPHA = {4: 0.673, 5: 0.697, 6: 0.709}


def _alpha(p: int) -> float:
    if p < 4:
        raise ValueError(f"HLL precision p must be >= 4, got {p}")
    if p in _ALPHA:
        return _ALPHA[p]
    m = 1 << p
    return 0.7213 / (1.0 + 1.079 / m)


def hll_rank(hash_col: Column, p: int) -> tuple[Column, Column]:
    """(bucket, rank) for a signed-bigint xxhash64 column.

    bucket = top ``p`` bits (logical shift, so the sign bit is data);
    rank   = leading zeros of the remaining ``64 - p`` bits, plus one
             (= ``R`` when the remainder is all-zero).

    The leading-zero count is ``(64 - p) - (floor(log2 w) + 1) + 1`` with
    ``floor(log2 w) + 1 == length(bin(w))`` — an exact integer identity
    (``F.bin`` renders without leading zeros), immune to the float-log2
    precision cliffs near powers of two.
    """
    nbits = 64 - p
    w = hash_col.bitwiseAND(F.lit((1 << nbits) - 1))
    rank = F.when(w == 0, F.lit(nbits + 1)).otherwise(
        F.lit(nbits + 1) - F.length(F.bin(w))
    )
    return F.shiftrightunsigned(hash_col, nbits).alias("bucket"), rank


def hll_registers(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    p: int = 12,
) -> DataFrame:
    """Per-group HLL register table: (group..., bucket, maxrank).

    One aggregation on (group, bucket) — map-side partial ``max`` means
    the shuffle carries at most ``groups x 2**p`` rows however large the
    input. NULL values are excluded (SQL COUNT(DISTINCT) semantics; also
    avoids Spark's hash-of-all-null = seed convention leaking a phantom
    element). The output is the sketch STATE: persist it per batch /
    partition and combine with `hll_merge`.
    """
    _alpha(p)  # validate p early
    bucket, rank = hll_rank(F.xxhash64(F.col(value_col)), p)
    return (
        df.filter(F.col(value_col).isNotNull())
        .select(*group_cols, bucket, rank.alias("_rank"))
        .groupBy(*group_cols, "bucket")
        .agg(F.max("_rank").alias("maxrank"))
    )


def hll_merge(*sketches: DataFrame) -> DataFrame:
    """Combine register tables (same group/bucket schema): bucket-wise max.

    HLL's register max is idempotent/commutative/associative, so merging
    sketches of any overlapping slices equals the sketch of their union —
    the property that makes per-batch sketches composable into daily /
    global rollups without touching raw data (test: `test_sketch.py`).
    """
    if not sketches:
        raise ValueError("hll_merge needs at least one sketch")
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    keys = [c for c in out.columns if c != "maxrank"]
    return out.groupBy(*keys).agg(F.max("maxrank").alias("maxrank"))


def hll_estimate(
    registers: DataFrame,
    group_cols: list[str],
    p: int,
    out_col: str = "est_distinct",
) -> DataFrame:
    """Estimate per group from a register table.

    The indicator sum ``sum(2**-maxrank) + zeros`` is computed exactly as
    the integer ``sum(2**(R - maxrank)) + zeros * 2**R`` in decimal(38,0)
    (R = 64 - p + 1 is the max possible rank, so every term is a
    non-negative integer power of two): integer addition is order-exact,
    where summing doubles of mixed magnitudes is not — this keeps the
    estimate bit-reproducible across engines and partitionings. Branches
    per Heule et al.: linear counting (``m * ln(m / zeros)``) when the raw
    estimate <= 2.5m with empty buckets remaining, else the raw
    harmonic-mean estimate; the 64-bit hash needs no large-range
    correction.
    """
    m = 1 << p
    big_r = 64 - p + 1
    # 2**(R - maxrank) is a power of two <= 2**(R-1) < 2**60: exact as a
    # double, exact after the decimal cast; the decimal SUM is exact.
    term = F.pow(F.lit(2.0), F.lit(big_r) - F.col("maxrank")).cast("decimal(38,0)")
    agg = registers.groupBy(*group_cols).agg(
        F.sum(term).alias("_terms"),
        F.count(F.lit(1)).alias("_filled"),
    )
    zeros = F.lit(m) - F.col("_filled")
    denom_scaled = (
        zeros.cast("decimal(38,0)") * F.lit(2.0 ** big_r).cast("decimal(38,0)")
        + F.col("_terms")
    ).cast("double")
    # alpha * m^2 * 2^R: python-folded product of exact powers of two and
    # the alpha literal — one identical double constant on every engine.
    raw = F.lit(_alpha(p) * float(m) * float(m) * (2.0 ** big_r)) / denom_scaled
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double")),
    ).otherwise(raw)
    return agg.select(
        *group_cols, F.round(est, 0).cast("bigint").alias(out_col)
    )


def approx_distinct(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    p: int = 12,
    out_col: str = "est_distinct",
) -> DataFrame:
    """Per-group approximate COUNT(DISTINCT value_col) via HLL.

    Standard error ~ 1.04 / sqrt(2**p). Two narrow shuffles total
    (registers, then per-group estimate), never a shuffle of raw values.
    """
    return hll_estimate(
        hll_registers(df, group_cols, value_col, p), group_cols, p, out_col
    )


def _double_hash_cols(value_col: str) -> tuple[Column, Column]:
    """(h1, h2) base hashes for Kirsch–Mitzenmacher double hashing.

    h1 = xxhash64(v) (seed 42); h2 = xxhash64(v, v) — Spark's multi-arg
    xxhash64 chains child hashes as seeds, so h2 = hashLong(v, hashLong(v,
    42)) for a long column: one extra mix, no new hash family, and both
    values are rebuildable in DuckDB SQL via `testing/xxh64_sql`
    (`hash_long_steps` chained). Derived slot r is (h1 + r*h2) mod width —
    the standard way (Kirsch & Mitzenmacher 2006) to get d independent-
    enough hash functions for Bloom/Count-Min from two base hashes.
    """
    v = F.col(value_col)
    return F.xxhash64(v), F.xxhash64(v, v)


def _slot(h1: Column, h2: Column, r: int, width: int) -> Column:
    """Row-r slot in [0, width). width MUST be a power of two: the low-bit
    mask of the SIGNED bigint equals the unsigned mod (two's complement),
    which keeps the Spark and DuckDB computations identical without any
    signed->unsigned detour. The stride is forced odd (coprime to 2^b) so
    successive rows walk distinct residues. All arithmetic stays below
    d * width < 2^40 — no ANSI-mode overflow risk."""
    if width & (width - 1) or width < 2:
        raise ValueError(f"width must be a power of two >= 2, got {width}")
    mask = width - 1
    base = h1.bitwiseAND(F.lit(mask))
    stride = h2.bitwiseAND(F.lit(mask)).bitwiseOR(F.lit(1))
    return (base + F.lit(r) * stride).bitwiseAND(F.lit(mask))


def cms_sketch(
    df: DataFrame,
    value_col: str,
    depth: int = 4,
    width: int = 4096,
    weight_col: str | None = None,
) -> DataFrame:
    """Count-Min sketch state (Cormode & Muthukrishnan 2005): rows
    ``(row, col, count)`` — a d x w grid of EXACT partial sums.

    Each input occurrence increments d cells; the groupBy carries at most
    ``depth * width`` rows through the shuffle (map-side partial sum)
    however large the input, and states merge across batches/partitions by
    plain ``sum`` (`cms_merge`) — the additive sibling of the HLL's
    register max. Estimates only ever OVER-count (collisions add), so
    ``min`` over the d rows is a one-sided bound: ideal for heavy-hitter
    screens over 100 TB token/URL streams where the exact groupBy would
    shuffle every raw value.

    NULLs are excluded (COUNT semantics). The hash layout is
    value-checked end-to-end by the DuckDB oracle
    (`__spark_entry__._cms_oracle_sql`)."""
    if depth < 1:
        raise ValueError(f"depth must be >= 1, got {depth}")
    h1, h2 = _double_hash_cols(value_col)
    w = F.lit(1).cast("long") if weight_col is None else F.col(weight_col)
    rows = F.explode(
        F.array(*[
            F.struct(F.lit(r).alias("row"), _slot(h1, h2, r, width).alias("col"))
            for r in range(depth)
        ])
    ).alias("rc")
    return (
        df.filter(F.col(value_col).isNotNull())
        .select(rows, w.alias("_w"))
        .groupBy(F.col("rc.row").alias("row"), F.col("rc.col").alias("col"))
        .agg(F.sum("_w").alias("count"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Combine CMS states (same depth/width): cell-wise sum. Exact — the
    merged state equals the sketch of the concatenated inputs."""
    if not sketches:
        raise ValueError("cms_merge needs at least one sketch")
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("row", "col").agg(F.sum("count").alias("count"))


def cms_estimate(
    sketch_df: DataFrame,
    items: DataFrame,
    value_col: str,
    depth: int,
    width: int,
    out_col: str = "est_count",
) -> DataFrame:
    """Point-frequency estimates for `items[value_col]`: min over the d
    cells (>= true count, always). The d-cell lookup is a broadcast-able
    equi-join against the slim state — the corpus is never re-read.

    NULL probe values are dropped (the sketch never counts NULLs, so the
    only honest estimate is "no row"); probe with a sentinel if NULL keys
    need tracking — same convention as `cms_sketch`'s build side."""
    h1, h2 = _double_hash_cols(value_col)
    probes = items.filter(F.col(value_col).isNotNull()).select(
        value_col,
        F.explode(
            F.array(*[
                F.struct(F.lit(r).alias("row"), _slot(h1, h2, r, width).alias("col"))
                for r in range(depth)
            ])
        ).alias("rc"),
    ).select(value_col, F.col("rc.row").alias("row"), F.col("rc.col").alias("col"))
    return (
        probes.join(F.broadcast(sketch_df), ["row", "col"], "left")
        .groupBy(value_col)
        .agg(F.min(F.coalesce(F.col("count"), F.lit(0))).alias(out_col))
    )


def _double_hash_py(v: int) -> tuple[int, int]:
    from ..testing.xxh64 import hash_long

    h1 = hash_long(v, 42)
    return h1, hash_long(v, h1)


def _slot_py(h1: int, h2: int, r: int, width: int) -> int:
    # unsigned low-bit masks == Spark's signed bitwiseAND (two's complement)
    return ((h1 & (width - 1)) + r * ((h2 & (width - 1)) | 1)) & (width - 1)


def cms_sketch_py(values, depth: int, width: int) -> dict[tuple[int, int], int]:
    """Pure-python CMS mirror (long values; lockstep with `cms_sketch`)."""
    grid: dict[tuple[int, int], int] = {}
    for v in values:
        if v is None:
            continue
        h1, h2 = _double_hash_py(v)
        for r in range(depth):
            key = (r, _slot_py(h1, h2, r, width))
            grid[key] = grid.get(key, 0) + 1
    return grid


def cms_estimate_py(
    grid: dict[tuple[int, int], int], v: int, depth: int, width: int
) -> int:
    h1, h2 = _double_hash_py(v)
    return min(grid.get((r, _slot_py(h1, h2, r, width)), 0) for r in range(depth))


def bloom_build(
    df: DataFrame, value_col: str, n_hashes: int = 7, n_bits: int = 1 << 16
) -> DataFrame:
    """Bloom filter state: the DISTINCT set bit positions (one slim column).

    k positions per element via the same double-hash slots as the CMS; the
    state is at most ``n_bits`` rows, merges across batches by plain
    union+distinct (set OR), and never false-negatives. This is the
    persistable counterpart of Spark's ephemeral runtime bloom pruning —
    build once over yesterday's 100 TB key set, broadcast-join today's
    batch against it (`bloom_contains`) to pre-filter before the expensive
    shuffle join."""
    if n_hashes < 1:
        raise ValueError(f"n_hashes must be >= 1, got {n_hashes}")
    h1, h2 = _double_hash_cols(value_col)
    return (
        df.filter(F.col(value_col).isNotNull())
        .select(
            F.explode(
                F.array(*[_slot(h1, h2, r, n_bits) for r in range(n_hashes)])
            ).alias("bit")
        )
        .distinct()
    )


def bloom_contains(
    bloom: DataFrame,
    items: DataFrame,
    value_col: str,
    n_hashes: int,
    n_bits: int,
    out_col: str = "maybe_present",
) -> DataFrame:
    """items + boolean `out_col`: true iff ALL k bits are set (possible
    member — false positives at the standard (1 - e^(-kn/m))^k rate, never
    false negatives). The probe is a broadcast left join on the bit
    column; counting matched bits == k avoids materializing the filter as
    a driver-side bitmap.

    NULL probe values get `out_col` = false: `bloom_build` never inserts
    NULLs, so a NULL key is definitionally not a member (previously the
    null-rejecting join-back left them NULL)."""
    h1, h2 = _double_hash_cols(value_col)
    probes = items.filter(F.col(value_col).isNotNull()).select(
        value_col,
        F.explode(
            F.array(*[_slot(h1, h2, r, n_bits) for r in range(n_hashes)])
        ).alias("bit"),
    )
    hits = (
        probes.join(
            F.broadcast(bloom.withColumn("_set", F.lit(1))), ["bit"], "left"
        )
        .groupBy(value_col)
        .agg((F.sum(F.coalesce(F.col("_set"), F.lit(0))) == F.lit(n_hashes)).alias(out_col))
    )
    return items.join(hits, [value_col], "left").withColumn(
        out_col, F.coalesce(F.col(out_col), F.lit(False))
    )


def bloom_build_py(values, n_hashes: int, n_bits: int) -> set[int]:
    bits: set[int] = set()
    for v in values:
        if v is None:
            continue
        h1, h2 = _double_hash_py(v)
        bits.update(_slot_py(h1, h2, r, n_bits) for r in range(n_hashes))
    return bits


def bloom_contains_py(bits: set[int], v: int, n_hashes: int, n_bits: int) -> bool:
    h1, h2 = _double_hash_py(v)
    return all(_slot_py(h1, h2, r, n_bits) in bits for r in range(n_hashes))


def hll_registers_py(values, p: int) -> dict[int, int]:
    """Pure-python register mirror (long values; lockstep with
    `hll_registers` per the testing/oracle.py convention)."""
    from ..testing.xxh64 import hash_long

    nbits = 64 - p
    regs: dict[int, int] = {}
    for v in values:
        if v is None:
            continue
        u = hash_long(v, 42)
        w = u & ((1 << nbits) - 1)
        rank = (nbits + 1 - w.bit_length()) if w else nbits + 1
        b = u >> nbits
        if rank > regs.get(b, 0):
            regs[b] = rank
    return regs


def approx_distinct_py(values, p: int) -> int:
    """Pure-python mirror of `approx_distinct` for one group — bit-exact
    (same integer-scaled denominator, same HALF_UP rounding)."""
    import math

    m = 1 << p
    big_r = 64 - p + 1
    regs = hll_registers_py(values, p)
    terms = sum(1 << (big_r - r) for r in regs.values())
    zeros = m - len(regs)
    raw = _alpha(p) * m * m * (2.0 ** big_r) / float(zeros * (1 << big_r) + terms)
    if raw <= 2.5 * m and zeros > 0:
        est = m * math.log(m / zeros)
    else:
        est = raw
    return int(math.floor(est + 0.5))  # HALF_UP for positives, like F.round
