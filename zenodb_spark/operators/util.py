"""Shared operator utilities."""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def lit_vec(xs) -> Column:
    """Constant ``array<double>`` literal built in ONE Py4J round-trip.

    ``F.array(*[F.lit(float(x)) for x in xs])`` costs dim+1 JVM round-trips
    per vector — profiled at 0.5-2.5 s of pure driver-side chatter for an
    8x64 model (512 literals), which dominated q33/q63/q107's bench time.
    Parsing ``array(<repr>D, ...)`` in one ``F.expr`` call yields the SAME
    CreateArray(Literal double) tree: Python ``repr`` round-trips doubles
    exactly and Spark's ``D`` suffix parses with java.lang.Double semantics
    (bitwise-verified incl. denormals, +-0.0 and max-double). Non-finite
    values have no SQL literal form and fall back to the per-element path.
    """
    xs = [float(x) for x in xs]
    if not xs or not all(map(math.isfinite, xs)):
        return F.array(*[F.lit(x) for x in xs])
    return F.expr("array(" + ",".join(repr(x) + "D" for x in xs) + ")")


def lit_mat(rows) -> Column:
    """Constant ``array<array<double>>`` literal (one ``F.expr`` parse).

    Same contract and bitwise guarantee as :func:`lit_vec`, one level up:
    a whole plane/centroid matrix rides the plan as ONE parsed expression
    instead of rows x (dim+1) JVM round-trips. Non-finite rows fall back to
    per-row :func:`lit_vec` construction."""
    rows = [[float(x) for x in r] for r in rows]
    if not rows or not all(all(map(math.isfinite, r)) for r in rows):
        return F.array(*[lit_vec(r) for r in rows])
    return F.expr(
        "array("
        + ",".join("array(" + ",".join(repr(x) + "D" for x in r) + ")" for r in rows)
        + ")"
    )


def spread(df: DataFrame) -> DataFrame:
    """Repartition only when the input is under-partitioned relative to the
    cluster (e.g. a single unsplittable file): pairwise vector math and
    shingle explodes are CPU-bound, and Catalyst adds no parallelism below a
    narrow chain — with a broadcast join the whole pipeline inherits the
    scan's partitioning.

    Under-partitioning is detected from the scan's file listing
    (``inputFiles``), NOT ``df.rdd`` — converting to RDD lineage forces plan
    materialization and hides the frame from AQE. A real corpus has ≥ cores
    input files, so this is a no-op with no added shuffle at scale; a
    single-file local read (or an in-memory test frame, which reports zero
    input files) gets one explicit round-robin spread."""
    sc = df.sparkSession.sparkContext
    try:
        nfiles = len(df.inputFiles())
    except Exception:
        nfiles = 0
    if nfiles < sc.defaultParallelism:
        return df.repartition(sc.defaultParallelism)
    return df
