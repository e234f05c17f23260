"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


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
