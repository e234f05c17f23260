"""Loaders for the driver-generated testdata corpus (TESTDATA.md).

Tables: region nation customer supplier part orders lineitem events
documents embeddings — one parquet file each under ``{sf_dir}/``.

``events.ts`` is physically INT64 TIMESTAMP(NANOS); with
``spark.sql.legacy.parquet.nanosAsLong=true`` Spark surfaces it as a long.
We normalize it to a microsecond TimestampType column (DuckDB truncates the
same way, so oracle comparisons line up) and keep ``ts_ns`` for exact
integer bucket math.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def normalize_points(df: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Normalize a points frame whose timestamp surfaced as int64 nanos
    (``nanosAsLong``): convert to µs TimestampType, keeping the raw long as
    ``{ts_col}_ns`` so range predicates still reach parquet row-group
    stats."""
    if dict(df.dtypes).get(ts_col) == "bigint":
        # integer `div`, NOT `/`: float division of epoch-nanos (~1.7e18)
        # has a 256-ns double ulp — off-by-µs timestamps that second-
        # granularity buckets never see but session durations do
        df = df.withColumn(f"{ts_col}_ns", F.col(ts_col)).withColumn(
            ts_col, F.timestamp_micros(F.expr(f"`{ts_col}` div 1000"))
        )
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # events.parquet stores INT64 TIMESTAMP(NANOS); any SparkSession (not
    # just ours from session.py) must read it, so set the legacy conf here.
    # Runtime-settable and idempotent.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        df = normalize_points(df)
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view (for spark.sql paths)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
