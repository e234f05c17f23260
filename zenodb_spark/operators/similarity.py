"""Similarity search over embedding columns (array<float>).

Two tiers:

- ``cosine_topk``      — brute-force exact top-k. The query side is small
  and **broadcast**, so the scan side streams once with no shuffle: the
  correct baseline at any scale (k·|Q| driver memory only).
- ``lsh_cosine_topk``  — random-hyperplane LSH bucketing: each vector gets a
  b-bit sign fingerprint from deterministic pseudo-random planes; probing
  compares only vectors sharing a bucket (multi-probe over hamming-1
  neighbors to cut misses). Turns O(N·Q) into O(Q·bucket_size): the 100 TB
  path.

Dot products use ``zip_with`` + ``aggregate`` — sequential double-precision
accumulation in index order, bit-identical to the DuckDB oracle.
"""

from __future__ import annotations

import math
import random

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def dot(a: Column | str, b: Column | str) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column | str) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )


def cosine(a: Column | str, b: Column | str) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact top-k cosine neighbors for every query vector.

    queries is broadcast; ranking is per-query via a window over the
    (small) q×N candidate set, tie-broken by neighbor id for determinism.
    Self-matches are excluded.
    """
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", dot("qv", "cv") / (norm("qv") * norm("cv")))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def _planes(dim: int, bits: int, seed: int = 42) -> list[list[float]]:
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(bits)]


def lsh_fingerprint(vec_col: Column | str, planes: list[list[float]]) -> Column:
    """Sign-bit fingerprint of a vector against fixed hyperplanes."""
    vec_col = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    bits = []
    for j, plane in enumerate(planes):
        lit_plane = F.array(*[F.lit(x) for x in plane])
        d = F.aggregate(
            F.zip_with(vec_col, lit_plane, lambda x, y: x.cast("double") * y),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bits.append(F.when(d >= 0, F.lit(1 << j)).otherwise(F.lit(0)))
    return sum(bits[1:], start=bits[0]).cast("long")


def lsh_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    bits: int = 8,
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: compare only within matching LSH buckets
    (multi-probe: exact bucket + all hamming-1 neighbor buckets)."""
    planes = _planes(dim, bits, seed)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        lsh_fingerprint(vec_col, planes).alias("bucket"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        lsh_fingerprint(vec_col, planes).alias("qb"),
    )
    probes = q.select(
        "query_id",
        "qv",
        F.explode(
            F.array(F.col("qb"), *[F.col("qb").bitwiseXOR(F.lit(1 << j)) for j in range(bits)])
        ).alias("bucket"),
    )
    scored = c.join(F.broadcast(probes), "bucket").filter(
        F.col("query_id") != F.col("neighbor_id")
    ).withColumn("cosine", dot("qv", "cv") / (norm("qv") * norm("cv")))
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )
