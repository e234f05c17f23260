"""Bucketed (pre-shuffled) table storage for co-located joins.

At 100 TB the dominant cost of a fact-fact join is the shuffle of both
sides on the join key. Bucketing moves that shuffle to WRITE time, once:
`df.write.bucketBy(n, key).sortBy(key)` hash-clusters rows into n files
per partition by the key, and every later join or aggregation on that key
reads the buckets co-located — Catalyst drops the Exchange (and with
sortBy, the Sort) from the plan entirely. The classic use: land orders
and lineitem bucketed by orderkey once per day, then every downstream
join of the two is shuffle-free forever.

This is the Spark replacement for the reference's ``partitionby`` dim
clustering (zenodb table.go partitionBy → file clustering): same idea —
organize storage by the hot key — expressed through the engine's native
bucket metadata so the OPTIMIZER can prove co-location and elide
exchanges, not just skip files.

Bucketed writes go through ``saveAsTable`` (bucket metadata lives in the
session catalog; a path-only parquet write cannot carry it). With the
default in-memory catalog the metadata lasts for the session — exactly
the lifetime of a bench/driver run; production deployments point
``spark.sql.warehouse.dir``/metastore at durable storage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

__all__ = ["write_bucketed", "read_bucketed"]


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Materialize ``df`` as a bucketed (and optionally sorted) parquet
    table in the session catalog. ``n_buckets`` should be sized so one
    bucket of the LARGER join side fits an executor task comfortably
    (rows/bucket ≈ |df| / n_buckets; at 100 TB think thousands, not 8 —
    both sides must use the SAME count for a co-located join)."""
    if path is None:
        # saveAsTable with the in-memory catalog refuses to CREATE a table
        # whose default warehouse location already exists on disk — the
        # state every fresh process inherits from a prior run's managed
        # table (catalog forgot it, directory survived). A stale managed
        # location is cache, not data: remove it before writing.
        import os
        import shutil

        wh = df.sparkSession.conf.get(
            "spark.sql.warehouse.dir", "spark-warehouse"
        ).removeprefix("file:")
        loc = os.path.join(wh, table.lower())
        if not df.sparkSession.catalog.tableExists(table) and os.path.exists(loc):
            shutil.rmtree(loc)
    w = df.write.format("parquet").mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    if path:
        w = w.option("path", path)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back. Goes through the catalog (not a path
    read) so the bucket spec survives into the scan and joins on the
    bucket key skip their Exchange."""
    return spark.table(table)
