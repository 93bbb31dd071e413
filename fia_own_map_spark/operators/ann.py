"""Approximate-nearest-neighbor search over an embedding column.

  * ``cosine_topk``      — brute-force cosine top-k (baseline): broadcast the
    query set, dot products via native higher-order functions
    (zip_with + aggregate, JVM-side), window top-k per query.
  * ``lsh_cosine_topk``  — scale path: random-hyperplane LSH. Deterministic
    seeded planes (broadcast literals), sign-bit bucket, candidates searched
    within bucket (+ optional multiprobe by flipping one bit).

At 100 TB the brute-force path is O(|corpus| x |queries|) and is only correct
for small query sets with a broadcast side; the LSH path shuffles each corpus
row once to its bucket and joins bucket-local.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Native dot product of two array<float/double> columns (no UDF)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")))


def cosine(a: Column, b: Column) -> Column:
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom == 0, F.lit(0.0)).otherwise(dot(a, b) / denom)


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Brute-force cosine top-k: (query_id, vec_id, score, rank).

    queries: (query_id, embedding). The query side is broadcast — the corpus
    is never shuffled, one scan + local top-k via window.
    """
    q = queries.select(
        F.col(query_id_col), F.col(vec_col).alias("_qvec")
    )
    scored = corpus.crossJoin(F.broadcast(q)).select(
        query_id_col,
        id_col,
        F.round(cosine(F.col(vec_col), F.col("_qvec")), 6).alias("score"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("score"), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _seeded_planes(n_planes: int, dim: int, seed: int = 42) -> list[list[float]]:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def _infer_dim(df: DataFrame, vec_col: str) -> int:
    """Vector dimension from the first row (one Spark job — pass dim
    explicitly on production paths); 0 when the input is empty."""
    row = df.select(vec_col).first()
    return len(row[0]) if row is not None and row[0] is not None else 0


def hyperplane_bucket(vec_col: Column | str, planes: list[list[float]]) -> Column:
    """Sign-bit bucket string from deterministic hyperplanes (native exprs)."""
    v = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    bits = [
        F.when(dot(v, F.array(*[F.lit(float(x)) for x in plane])) >= 0, F.lit("1")).otherwise(
            F.lit("0")
        )
        for plane in planes
    ]
    return F.concat(*bits)


def lsh_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_planes: int = 8,
    dim: int | None = None,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """LSH-bucketed cosine top-k: exact cosine within the query's bucket.

    Recall < 1 by construction (bucket misses); the bench compares it to the
    brute-force baseline. Pass ``dim`` explicitly on production paths —
    inference costs a Spark job and needs a non-empty query set.
    """
    if dim is None:
        dim = _infer_dim(queries, vec_col)
        if dim == 0:  # empty query set — empty result
            return queries.sparkSession.createDataFrame(
                [], f"{query_id_col} long, {id_col} long, score double, rank int"
            )
    planes = _seeded_planes(n_planes, dim, seed)
    c = corpus.withColumn("_bucket", hyperplane_bucket(vec_col, planes))
    q = queries.select(
        F.col(query_id_col),
        F.col(vec_col).alias("_qvec"),
    ).withColumn("_bucket", hyperplane_bucket("_qvec", planes))
    scored = c.join(q, "_bucket").select(
        query_id_col,
        id_col,
        F.round(cosine(F.col(vec_col), F.col("_qvec")), 6).alias("score"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("score"), F.col(id_col))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
