"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame) -> DataFrame:
    """Repartition only when the input is under-partitioned relative to the
    cluster (e.g. a single unsplittable file): pairwise vector math and
    shingle explodes are CPU-bound, and Catalyst adds no parallelism below a
    narrow chain — with a broadcast join the whole pipeline inherits the
    scan's partitioning. When the input already has ≥ cores partitions (any
    real corpus), this is a no-op: no shuffle is added at scale."""
    sc = df.sparkSession.sparkContext
    if df.rdd.getNumPartitions() < sc.defaultParallelism:
        return df.repartition(sc.defaultParallelism)
    return df
