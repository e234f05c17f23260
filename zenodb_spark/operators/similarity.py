"""Similarity search over embedding columns (array<float>).

Four operators:

- ``cosine_topk``         — brute-force exact top-k. The query side is
  small and **broadcast**, so the scan side streams once with no shuffle:
  the correct baseline at any scale (k·|Q| driver memory only).
- ``lsh_cosine_topk``     — random-hyperplane LSH bucketing: each vector
  gets a b-bit sign fingerprint from deterministic pseudo-random planes;
  probing compares only vectors sharing a bucket (multi-probe over
  hamming-1 neighbors to cut misses). Turns O(N·Q) into O(Q·bucket_size):
  the 100 TB ANN path.
- ``cosine_neardup_pairs`` — EXACT threshold self-join (the dedup family's
  cosine member): triangle-blocked all-pairs with numpy block-matrix
  scoring inside ``applyInPandas``; vectors cross the shuffle once per
  block-pair group, never once per pair.
- ``ivf_assign`` / ``ivf_search`` — inverted-file ANN: coarse-quantize to
  nearest centroid; queries scan only their probe centroids' lists.

SQL-side dot products use ``zip_with`` + ``aggregate`` — sequential
double-precision accumulation in index order, bit-identical to DuckDB's
``list_dot_product``; the numpy scorer accumulates dimension-sequentially
for the same reason. Norms are always computed once per vector BEFORE a
join, never per pair.
"""

from __future__ import annotations

import math
import random

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from zenodb_spark.operators.util import all_finite, lit_mat, lit_vec, spread, sql_double


def _lit_centroids(cents: list[list[float]]) -> Column:
    """Constant ``array<struct<c:array<double>, cc:double>>`` carrying each
    centroid/codeword with its precomputed squared norm, parsed in ONE
    ``F.expr`` call (the per-codeword loop cost ~25 Py4J round-trips each —
    round 6). ``cc`` is the same Python-side left-to-right double sum the
    per-codeword form inlined as ``F.lit(cc)``. Literal serialization is
    util.sql_double — the single home of the repr+'D' format and its
    bitwise guarantee (round 7, ADVICE r6)."""
    parts = []
    for c in cents:
        c = [float(x) for x in c]
        cc = sum((x * x for x in c), 0.0)
        if not c or not all_finite(c + [cc]):
            # no SQL literal form for non-finite doubles; fall back
            return F.array(
                *[
                    F.struct(
                        lit_vec(cent).alias("c"),
                        F.lit(sum((x * x for x in cent), 0.0)).alias("cc"),
                    )
                    for cent in cents
                ]
            )
        parts.append(
            "named_struct('c', array("
            + ",".join(sql_double(x) for x in c)
            + "), 'cc', "
            + sql_double(cc)
            + ")"
        )
    return F.expr("array(" + ",".join(parts) + ")")


def dot(a: Column | str, b: Column | str, dim: int | None = None) -> Column:
    """Sequential-order dot product (bit-identical to DuckDB's
    list_dot_product). zip_with + aggregate, NOT an unrolled sum: unrolling
    64-dim dots into 64-term expressions looks codegen-friendly but blows
    Janino compile time up by tens of seconds per plan (measured); the
    higher-order-function path is a tight interpreted loop and wins. `dim`
    is accepted for API stability and ignored."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column | str, dim: int | None = None) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )


def cosine(a: Column | str, b: Column | str, dim: int | None = None) -> Column:
    return dot(a, b, dim) / (norm(a, dim) * norm(b, dim))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    dim: int | None = None,
) -> DataFrame:
    """Exact top-k cosine neighbors for every query vector.

    queries is broadcast; ranking is per-query via a window over the
    (small) q×N candidate set, tie-broken by neighbor id for determinism.
    Self-matches are excluded.
    """
    # norms are computed once per VECTOR before the join (not once per pair):
    # per-pair work drops to a single unrolled dot product
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        norm(vec_col, dim).alias("nq"),
    )
    c = spread(corpus).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        norm(vec_col, dim).alias("nc"),
    )
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", dot("qv", "cv", dim) / (F.col("nq") * F.col("nc")))
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
    dim: int | None = None,
) -> DataFrame:
    """Exact embedding-cosine near-duplicate pairs: every unordered pair
    (a, b) with cosine(a, b) ≥ threshold, as (doc_a < doc_b, cosine).

    Distribution strategy is **triangle-blocked all-pairs**: rows are hashed
    into `blocks` blocks; each row is shipped to every block-pair it
    participates in (side 'a' for pairs ``(its_block, j≥its_block)``, side
    'b' for ``(i≤its_block, its_block)``) and each block-pair group scores
    its own (N/blocks)² pair matrix with numpy inside ``applyInPandas``.
    Shuffle volume is N·(blocks+2) VECTORS — each vector crosses the wire
    once per group it joins, never once per pair (a pair-level join would
    Arrow-serialize the duplicated vectors: measured 25× slower). Comparison
    work N²/2 spreads evenly over block-pairs, so wall-clock scales with
    cores at any corpus size; pick blocks ≈ N/2000 so a group's score
    matrix stays ~32 MB. The approximate scale path (when N² itself is too
    much) is ``lsh_cosine_topk``'s bucketing.

    Bit-exactness: norms are computed Spark-side (zip_with, once per
    vector); the numpy scorer accumulates the pair matrix
    dimension-sequentially (``C += outer(A[:,d], B[:,d])`` for d = 0…dim-1)
    — the identical left-to-right double addition order as DuckDB's
    list_dot_product, so thresholds compare identical doubles. This is the
    dedup family's cosine member (reference has no equivalent; extension
    per BASELINE.json); candidates are not pruned, the result is the full
    true pair set at any threshold.
    """
    ids = F.col(id_col)
    blk = F.pmod(F.xxhash64(ids), F.lit(blocks)).cast("int")
    base = spread(corpus).select(
        ids.alias("_id"),
        F.col(vec_col).alias("_v"),
        norm(vec_col, dim).alias("_n"),  # once per vector, not per pair
        blk.alias("_b"),
    )
    pair_ids = F.sequence(F.lit(0), F.lit(blocks - 1))
    side_a = base.select(
        "_id",
        "_v",
        "_n",
        F.lit("a").alias("side"),
        F.col("_b").alias("pk_i"),
        F.explode(F.filter(pair_ids, lambda j: j >= F.col("_b"))).alias("pk_j"),
    )
    side_b = base.select(
        "_id",
        "_v",
        "_n",
        F.lit("b").alias("side"),
        F.explode(F.filter(pair_ids, lambda i: i <= F.col("_b"))).alias("pk_i"),
        F.col("_b").alias("pk_j"),
    ).select("_id", "_v", "_n", "side", "pk_i", "pk_j")
    tagged = side_a.unionByName(side_b)

    thr = float(threshold)

    def score_group(pdf):
        import numpy as np
        import pandas as pd

        same_block = pdf["pk_i"].iloc[0] == pdf["pk_j"].iloc[0]
        a = pdf[pdf["side"] == "a"]
        b = pdf[pdf["side"] == "b"]
        if not len(a) or not len(b):
            return pd.DataFrame({"doc_a": [], "doc_b": [], "cosine": []}).astype(
                {"doc_a": "int64", "doc_b": "int64", "cosine": "float64"}
            )
        A = np.stack(a["_v"].to_numpy()).astype(np.float64)
        B = np.stack(b["_v"].to_numpy()).astype(np.float64)
        C = np.zeros((len(a), len(b)), dtype=np.float64)
        for d in range(A.shape[1]):  # dimension-sequential: exact FP order
            C += np.outer(A[:, d], B[:, d])
        C /= np.outer(a["_n"].to_numpy(), b["_n"].to_numpy())
        ia = a["_id"].to_numpy()
        ib = b["_id"].to_numpy()
        if same_block:
            # both orders + self-pairs present: keep strict upper triangle
            mask = (C >= thr) & (ia[:, None] < ib[None, :])
        else:
            mask = C >= thr
        ra, rb = np.nonzero(mask)
        pa, pb = ia[ra], ib[rb]
        return pd.DataFrame(
            {
                "doc_a": np.minimum(pa, pb),
                "doc_b": np.maximum(pa, pb),
                "cosine": C[mask],
            }
        )

    return tagged.groupBy("pk_i", "pk_j").applyInPandas(
        score_group, "doc_a long, doc_b long, cosine double"
    )


def _planes(dim: int, bits: int, seed: int = 42) -> list[list[float]]:
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(bits)]


def lsh_fingerprint(vec_col: Column | str, planes: list[list[float]]) -> Column:
    """Sign-bit fingerprint of a vector against fixed hyperplanes.

    One ``transform`` over a single constant plane matrix instead of a
    per-plane expression loop: the per-plane form cost ~20 Py4J round-trips
    x bits per plan build (round 6). Values are identical — the same
    sequential zip_with/aggregate dot decides each sign, ``shiftleft`` of a
    LONG base equals the old ``F.lit(1 << j)`` for every plane index up to
    62 (an int base overflows at j >= 31 — ADVICE r6; callers today use
    <= 16 planes, the long base keeps the equality unconditional), and the
    bit sum is the same left-to-right LONG integer addition."""
    if len(planes) > 62:
        raise ValueError(
            f"lsh_fingerprint: {len(planes)} planes exceed the 62 sign "
            "bits a long fingerprint can carry"
        )
    vec_col = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    bits = F.transform(
        lit_mat(planes),
        lambda p, j: F.when(
            F.aggregate(
                F.zip_with(vec_col, p, lambda x, y: x.cast("double") * y),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            >= 0,
            # PySpark's F.shiftleft wrapper rejects a Column shift amount;
            # the SQL function itself takes one
            F.call_function("shiftleft", F.lit(1).cast("long"), j),
        ).otherwise(F.lit(0).cast("long")),
    )
    return F.aggregate(bits, F.lit(0).cast("long"), lambda a, b: a + b)


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
    c = spread(corpus).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        norm(vec_col, dim).alias("nc"),
        lsh_fingerprint(vec_col, planes).alias("bucket"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        norm(vec_col, dim).alias("nq"),
        lsh_fingerprint(vec_col, planes).alias("qb"),
    )
    probes = q.select(
        "query_id",
        "qv",
        "nq",
        F.explode(
            F.array(F.col("qb"), *[F.col("qb").bitwiseXOR(F.lit(1 << j)) for j in range(bits)])
        ).alias("bucket"),
    )
    scored = c.join(F.broadcast(probes), "bucket").filter(
        F.col("query_id") != F.col("neighbor_id")
    ).withColumn("cosine", dot("qv", "cv", dim) / (F.col("nq") * F.col("nc")))
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def ivf_centroids(dim: int, k: int, seed: int = 43) -> list[list[float]]:
    """Deterministic pseudo-random centroids (a real deployment trains them
    with k-means on a sample; the partition/assignment plumbing is
    identical)."""
    return _planes(dim, k, seed)


def ivf_assign(
    corpus: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF coarse quantization: assign every vector to its nearest centroid
    (1-based index) — the inverted-file partitioning step of IVF ANN: at
    query time only the probe centroid's list (plus neighbors) is scanned.

    Squared L2 via ||v||² − 2·v·c + ||c||² with sequential-order dots, so
    the distances (and the first-min tie rule of array_position/min) are
    bit-identical to a DuckDB replay."""
    v = F.col(vec_col)
    vv = dot(v, v)
    # one transform over the constant centroid matrix instead of a
    # per-centroid expression loop (round 6: ~25 Py4J round-trips per
    # centroid). Each element evaluates the IDENTICAL ((vv - 2*dot) + cc)
    # IEEE sequence the loop form built, in the same centroid order.
    darr = F.transform(
        _lit_centroids(centroids), lambda t: vv - 2.0 * dot(v, t["c"]) + t["cc"]
    )
    return corpus.select(
        F.col(id_col),
        v.alias(vec_col),
        F.array_position(darr, F.array_min(darr)).cast("int").alias("centroid"),
    )


def ivf_search(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    nprobe: int = 2,
    assigned: DataFrame | None = None,
) -> DataFrame:
    """IVF ANN search: candidates are corpus vectors whose centroid is one
    of the query's `nprobe` nearest centroids; exact cosine re-rank within.
    Corpus side scans once with its (tiny) centroid id; the probe relation
    broadcasts — at scale the centroid column is the partition/cluster key
    so probing reads only the matching lists.

    ``assigned`` optionally passes a precomputed ``ivf_assign(corpus,
    centroids, ...)`` frame so multi-arm callers (the q210 nprobe curve)
    build the centroid-literal assignment expression once instead of once
    per arm — each build is ~500 Py4J round-trips of literal construction
    (round 6; same sharing precedent as ngram_jaccard_pairs_prefix's
    ``arrays=``)."""
    if assigned is None:
        assigned = ivf_assign(corpus, centroids, id_col, vec_col)
    c = assigned.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        norm(vec_col).alias("nc"),
        "centroid",
    )
    # nprobe nearest centroids per query: sort (distance, index) structs —
    # built with one transform over the constant centroid matrix (round 6),
    # same ((vv - 2*dot) + cc) sequence and same (d, i) sort keys
    v = F.col(vec_col)
    vv = dot(v, v)
    dists = F.transform(
        _lit_centroids(centroids),
        lambda t, i: F.struct(
            (vv - 2.0 * dot(v, t["c"]) + t["cc"]).alias("d"),
            (i + 1).alias("i"),
        ),
    )
    probes = F.slice(F.sort_array(dists), 1, nprobe)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        v.alias("qv"),
        norm(vec_col).alias("nq"),
        F.explode(F.transform(probes, lambda s: s["i"])).alias("centroid"),
    )
    scored = c.join(F.broadcast(q), "centroid").filter(
        F.col("query_id") != F.col("neighbor_id")
    ).withColumn("cosine", dot("qv", "cv") / (F.col("nq") * F.col("nc")))
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def cell_topk_pairs(
    assigned: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str = "centroid",
    k: int = 3,
    carry: tuple[tuple[str, str], ...] = (),
) -> DataFrame:
    """Per-vector top-k same-cell cosine neighbors, scored with the
    dimension-sequential numpy block scorer (the exact FP order of the
    zip_with/aggregate ``dot`` — see cosine_neardup_pairs) inside one
    ``applyInPandas`` per cell, instead of a cell self-join evaluating an
    interpreted 64-term fold per pair.

    Why (round 6, measured): the self-join formulation fans a bounded cell
    into |cell|² pair ROWS and evaluates ``dot`` per pair in the
    interpreted HOF path — and because the centroid-key shuffle is tiny,
    AQE coalesces it so the whole fan-out runs nearly serial (the bm25
    fan-out blindness). Here each cell ships its VECTORS once (N·dim
    floats, strictly less than N² pair rows), the pair matrix is scored
    vectorized in row blocks (~32 MB each, so a fat cell never
    materializes |cell|² doubles at once), and only k rows per vector come
    back. Norms are computed Spark-side once per vector, as everywhere.

    Ranking is (cosine desc, ``id_col`` asc) — the same total order as the
    ``row_number`` in the self-join formulation; cosine doubles are
    bit-identical, so the selected neighbors are too. Ids must be
    orderable (long or string). ``carry`` lists (column, spark_type)
    per-vector attributes to emit on both sides as ``a_<col>``/``b_<col>``.

    Output: (cell_col int, a_id long, b_id long, cosine double, rnk int
    [, a_<c>, b_<c> ...]). Vectors alone in their cell emit nothing (no
    neighbors), exactly like the self-join."""
    kk = int(k)
    carry_names = [c for c, _t in carry]
    schema = f"{cell_col} int, a_id long, b_id long, cosine double, rnk int" + "".join(
        f", a_{c} {t}, b_{c} {t}" for c, t in carry
    )
    _pd_t = {"int": "int32", "long": "int64", "double": "float64", "float": "float32"}
    out_dtypes = {cell_col: "int32", "a_id": "int64", "b_id": "int64",
                  "cosine": "float64", "rnk": "int32"}
    for c, t in carry:
        out_dtypes[f"a_{c}"] = out_dtypes[f"b_{c}"] = _pd_t.get(t, "object")
    base = assigned.select(
        F.col(cell_col).alias("_cell"),
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_v"),
        norm(vec_col).alias("_n"),
        *[F.col(c).alias(f"_x_{c}") for c in carry_names],
    )

    def score(pdf):
        import numpy as np
        import pandas as pd

        m = len(pdf)
        if m < 2:
            return pd.DataFrame({c: [] for c in out_dtypes}).astype(out_dtypes)
        ids = pdf["_id"].to_numpy()
        V = np.stack(pdf["_v"].to_numpy()).astype(np.float64)
        nrm = pdf["_n"].to_numpy().astype(np.float64)
        cell = pdf["_cell"].iloc[0]
        xtra = {c: pdf[f"_x_{c}"].to_numpy() for c in carry_names}
        a_idx, b_idx, cos_out, rnk_out = [], [], [], []
        blk = max(1, (1 << 22) // m)  # ~32 MB of C per row block
        for lo in range(0, m, blk):
            hi = min(m, lo + blk)
            C = np.zeros((hi - lo, m), dtype=np.float64)
            for d in range(V.shape[1]):  # dimension-sequential: exact FP order
                C += np.outer(V[lo:hi, d], V[:, d])
            C /= np.outer(nrm[lo:hi], nrm)
            for i in range(hi - lo):
                row = C[i]
                order = np.lexsort((ids, -row))  # cosine desc, id asc
                order = order[order != (lo + i)]  # drop self by position
                sel = order[:kk]
                a_idx.extend([lo + i] * len(sel))
                b_idx.extend(sel.tolist())
                cos_out.extend(row[sel].tolist())
                rnk_out.extend(range(1, len(sel) + 1))
        a_idx = np.asarray(a_idx, dtype=np.int64)
        b_idx = np.asarray(b_idx, dtype=np.int64)
        out = {
            cell_col: np.full(len(a_idx), cell),
            "a_id": ids[a_idx],
            "b_id": ids[b_idx],
            "cosine": np.asarray(cos_out, dtype=np.float64),
            "rnk": np.asarray(rnk_out),
        }
        for c in carry_names:
            out[f"a_{c}"] = xtra[c][a_idx]
            out[f"b_{c}"] = xtra[c][b_idx]
        return pd.DataFrame(out).astype(out_dtypes)

    return base.groupBy("_cell").applyInPandas(score, schema)


def semdedup_drop_list(
    corpus: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.38,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al., 2023, public):
    cluster the corpus with coarse centroids, then within each cluster drop
    every vector that has a LOWER-id near-duplicate at cosine >= threshold
    (keep-lowest-id, the same policy as exact_dedup). Returns the drop list
    with per-vector duplicate count and best similarity.

    Scale shape: the whole point of SemDeDup is that the quadratic pair
    search is confined within clusters — k grows with the corpus so cell
    size N/k stays bounded. Round 6: the within-cell scoring moved from a
    co-partitioned self-join (|cell|² pair rows, one interpreted HOF dot
    per pair, near-serial under AQE's small-shuffle coalescing) to the
    dimension-sequential numpy block scorer inside one ``applyInPandas``
    per cell — the same bit-exact FP order as ``dot`` (the
    cosine_neardup_pairs scorer), vectors shipped once per cell instead of
    once per pair, pair matrix bounded to ~32 MB row blocks. n_dups is an
    exact count and best_cos a max over bit-identical doubles, so the
    result is unchanged."""
    assigned = ivf_assign(corpus, centroids, id_col, vec_col)
    thr = float(threshold)
    base = assigned.select(
        F.col("centroid").alias("_cell"),
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_v"),
        norm(vec_col).alias("_n"),
    )
    out_dtypes = {"centroid": "int32", "dropped_vec": "int64",
                  "n_dups": "int64", "best_cos": "float64"}

    def score(pdf):
        import numpy as np
        import pandas as pd

        m = len(pdf)
        if m < 2:
            return pd.DataFrame({c: [] for c in out_dtypes}).astype(out_dtypes)
        ids = pdf["_id"].to_numpy()
        V = np.stack(pdf["_v"].to_numpy()).astype(np.float64)
        nrm = pdf["_n"].to_numpy().astype(np.float64)
        n_dups = np.zeros(m, dtype=np.int64)
        best = np.full(m, -np.inf, dtype=np.float64)
        blk = max(1, (1 << 22) // m)  # ~32 MB of C per row block
        for lo in range(0, m, blk):
            hi = min(m, lo + blk)
            C = np.zeros((hi - lo, m), dtype=np.float64)
            for d in range(V.shape[1]):  # dimension-sequential: exact FP order
                C += np.outer(V[lo:hi, d], V[:, d])
            C /= np.outer(nrm[lo:hi], nrm)
            mask = (C >= thr) & (ids[lo:hi, None] < ids[None, :])
            n_dups += mask.sum(axis=0)
            best = np.maximum(best, np.where(mask, C, -np.inf).max(axis=0))
        keep = n_dups > 0
        return pd.DataFrame(
            {
                "centroid": np.full(int(keep.sum()), pdf["_cell"].iloc[0]),
                "dropped_vec": ids[keep],
                "n_dups": n_dups[keep],
                "best_cos": best[keep],
            }
        ).astype(out_dtypes)

    return base.groupBy("_cell").applyInPandas(
        score, "centroid int, dropped_vec long, n_dups long, best_cos double"
    )


def kmeans_step(
    corpus: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1_000_000,
) -> DataFrame:
    """One Lloyd iteration of distributed k-means over an embedding column:
    assign every vector to its nearest centroid (`ivf_assign`, bit-exact
    argmin), then recompute each centroid as the component-wise mean of its
    members. This is how IVF coarse centroids are actually trained (the
    seeded `ivf_centroids` are the k-means init).

    Engine-exact means: components quantize to integer 1/`scale` units
    BEFORE summation (no float-sum order dependence); the trailing
    sum/count/scale division is a fixed IEEE sequence.

    Output: (centroid, dim_idx, n_assigned, value) — k·dim rows.

    Scale shape: one broadcast-literal assignment pass (k·dim doubles ride
    the plan, no join), one posexplode (×dim), one hash aggregate on
    (centroid, dim_idx) — k·dim groups. Linear in corpus size, no driver
    collect; iterating keeps only the k·dim centroid model on the driver,
    which is the legitimate model state of Lloyd's algorithm."""
    assigned = ivf_assign(corpus, centroids, id_col, vec_col)
    comp = assigned.select(
        "centroid", F.posexplode(F.col(vec_col)).alias("dim_idx", "x")
    ).select(
        "centroid",
        F.col("dim_idx").cast("long").alias("dim_idx"),
        F.floor(F.col("x").cast("double") * F.lit(float(scale)) + F.lit(0.5))
        .cast("long")
        .alias("xq"),
    )
    n = F.count(F.lit(1))
    return comp.groupBy("centroid", "dim_idx").agg(
        n.cast("long").alias("n_assigned"),
        (
            F.sum("xq").cast("double") / n.cast("double") / F.lit(float(scale))).alias("value"),
    )


def kmeans_train(
    corpus: DataFrame,
    dim: int,
    k: int,
    iters: int = 5,
    seed: int = 43,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Train IVF coarse centroids with `iters` Lloyd iterations from the
    seeded init. Empty clusters keep their previous centroid (standard
    practice). Returns the trained k×dim model (driver-side by design —
    it IS the model)."""
    cents = ivf_centroids(dim, k, seed)
    for _ in range(iters):
        rows = kmeans_step(corpus, cents, id_col, vec_col).collect()
        new = [list(c) for c in cents]
        for r in rows:
            new[r["centroid"] - 1][r["dim_idx"]] = r["value"]
        cents = new
    return cents


def pq_codebooks(
    dim: int, m: int, k: int, seed: int = 101
) -> list[list[list[float]]]:
    """Deterministic per-subspace PQ codebooks (m subspaces of dim/m, k
    codewords each). A real deployment trains them with per-subspace
    k-means (see kmeans_train); the assignment plumbing is identical."""
    sub = dim // m
    return [_planes(sub, k, seed + j) for j in range(m)]


def pq_assign(
    corpus: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Product-quantization encoding: split each vector into m contiguous
    subvectors, assign each to its nearest codeword — the IVF-PQ memory
    layout (code bytes instead of floats) that makes 100 TB-scale ANN
    affordable: m codes of one byte each replace dim×4 bytes per vector.

    One narrow projection, no shuffle, no UDF: sub-slices via F.slice,
    squared L2 via ||s||² − 2·s·c + ||c||² with sequential-order dots
    (bit-identical to a DuckDB list_dot_product replay), first-min
    tie-break via array_position. Emits one row per (vector, subspace)
    with the chosen code and the micro-quantized quantization error.
    """
    corpus = spread(corpus)
    sub = len(codebooks[0][0])
    rows = []
    for j, cb in enumerate(codebooks):
        s = F.slice(F.col(vec_col), j * sub + 1, sub)
        ss = dot(s, s)
        # one transform per subspace over the constant codeword structs
        # (round 6 construction fix); identical ((ss - 2*dot) + cc) doubles
        darr = F.transform(
            _lit_centroids(cb), lambda t: ss - 2.0 * dot(s, t["c"]) + t["cc"]
        )
        rows.append(
            F.struct(
                F.lit(j + 1).alias("subspace"),
                F.array_position(darr, F.array_min(darr)).cast("int").alias("code"),
                F.floor(F.array_min(darr) * F.lit(1_000_000) + F.lit(0.5))
                .cast("long")
                .alias("err_micro"),
            )
        )
    return corpus.select(
        F.col(id_col), F.explode(F.array(*rows)).alias("pq")
    ).select(
        id_col,
        F.col("pq.subspace").alias("subspace"),
        F.col("pq.code").alias("code"),
        F.col("pq.err_micro").alias("err_micro"),
    )


def pq_lut(
    queries: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-query PQ distance lookup table for ADC (asymmetric distance
    computation): for every (query, subspace, codeword), the exact
    squared L2 between the query's subvector and the codeword —
    micro-quantized to a long so downstream per-document sums are exact
    integer adds (order-free across partitions).

    m·k rows per query (e.g. 4·8 = 32): O(model) output, broadcastable.
    Same expression shapes as pq_assign, so the DuckDB oracle replay is
    bit-identical."""
    sub = len(codebooks[0][0])
    per_sub = []
    for j, cb in enumerate(codebooks):
        s = F.slice(F.col(vec_col), j * sub + 1, sub)
        ss = dot(s, s)
        # one transform per subspace (round 6 construction fix); identical
        # ((ss - 2*dot) + cc) doubles and the same (subspace, code) labels
        # the lambda runs eagerly inside F.transform, so capturing the loop
        # vars j/s/ss is safe (and a default-arg would break PySpark's
        # lambda-arity detection)
        per_sub.append(
            F.transform(
                _lit_centroids(cb),
                lambda t, ci: F.struct(
                    F.lit(j + 1).alias("subspace"),
                    (ci + 1).alias("code"),
                    F.floor(
                        (ss - 2.0 * dot(s, t["c"]) + t["cc"]) * F.lit(1_000_000)
                        + F.lit(0.5)
                    )
                    .cast("long")
                    .alias("d_micro"),
                ),
            )
        )
    return queries.select(
        F.col(id_col).alias("query_id"),
        F.explode(F.flatten(F.array(*per_sub))).alias("t"),
    ).select(
        "query_id",
        F.col("t.subspace").alias("subspace"),
        F.col("t.code").alias("code"),
        F.col("t.d_micro").alias("d_micro"),
    )
