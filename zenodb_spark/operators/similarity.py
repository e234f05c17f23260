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


def cosine_neardup_pairs(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    blocks: int = 8,
) -> DataFrame:
    """Exact embedding-cosine near-duplicate pairs: every unordered pair
    (a, b) with cosine(a, b) ≥ threshold, as (doc_a < doc_b, cosine).

    Distribution strategy is **triangle-blocked all-pairs**: rows are hashed
    into `blocks` blocks; each row is replicated to every block-pair it
    participates in (side A to pairs ``(its_block, j≥its_block)``, side B to
    pairs ``(i≤its_block, its_block)``) and the two sides meet in an
    **equi-join on the block-pair key** — a plain shuffle hash join, no
    broadcast, no cross join, no driver collect. Shuffle volume is N·blocks
    rows; comparison work N²/2 spread evenly over block-pairs, so wall-clock
    scales with cores at any corpus size. The approximate scale path (when
    N² itself is too much) is ``lsh_cosine_topk``'s bucketing.

    Exactness note: this is the dedup family's cosine member (reference has
    no equivalent; extension per BASELINE.json) — candidates are not pruned,
    so the result is the full true pair set at any threshold.
    """
    ids = F.col(id_col)
    blk = F.pmod(F.xxhash64(ids), F.lit(blocks)).cast("int")
    base = corpus.select(ids.alias("_id"), F.col(vec_col).alias("_v"), blk.alias("_b"))
    pair_ids = F.sequence(F.lit(0), F.lit(blocks - 1))
    left = base.select(
        "_id",
        "_v",
        "_b",
        F.explode(F.filter(pair_ids, lambda j: j >= F.col("_b"))).alias("_j"),
    ).select(
        F.col("_id").alias("id_a"),
        F.col("_v").alias("va"),
        F.col("_b").alias("pk_i"),
        F.col("_j").alias("pk_j"),
    )
    right = base.select(
        "_id",
        "_v",
        "_b",
        F.explode(F.filter(pair_ids, lambda i: i <= F.col("_b"))).alias("_i"),
    ).select(
        F.col("_id").alias("id_b"),
        F.col("_v").alias("vb"),
        F.col("_i").alias("pk_i"),
        F.col("_b").alias("pk_j"),
    )
    pairs = left.join(right, on=["pk_i", "pk_j"]).filter(
        # same-block pairs meet at key (i,i) with both orders + self-pairs:
        # keep one order; cross-block pairs meet exactly once, any id order.
        (F.col("pk_i") != F.col("pk_j")) | (F.col("id_a") < F.col("id_b"))
    )
    scored = pairs.withColumn("cosine", dot("va", "vb") / (norm("va") * norm("vb")))
    return scored.filter(F.col("cosine") >= F.lit(threshold)).select(
        F.least("id_a", "id_b").alias("doc_a"),
        F.greatest("id_a", "id_b").alias("doc_b"),
        "cosine",
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
