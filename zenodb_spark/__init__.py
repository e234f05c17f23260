"""zenodb_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of getlantern/zenodb (time-series DB storing
only pre-aggregated data), re-expressed Spark-first.

Architecture (see SURVEY.md §7):

- ``session``    — tuned SparkSession factory (AQE, Arrow, UTC, pushdown).
- ``catalog``    — loaders for the driver testdata star schema + events.
- ``functions``  — measure expressions (IF/BOUNDED/WAVG/safe-div/LOG*) and
                   dimension expressions (CONCAT/SPLIT/.../DECODE) mirroring
                   the reference's expr/ and goexpr surface.
- ``operators``  — time ops (period/stride/shift/crosshift), crosstab,
                   percentile (exact + mergeable histogram sketch), top-k,
                   dedup family, similarity search, text analysis,
                   multimodal plumbing.
- ``ir`` / ``sqlparser`` / ``plans`` — the ZenoDB SQL dialect parsed to a
                   Query IR and compiled to DataFrame pipelines.
- ``engine``     — DB facade: schema registry, tables as materialized
                   aggregates with mergeable state columns, insert + query.
- ``streaming``  — Structured Streaming ingest (partial-state append model).

Everything here derives from the public Apache Spark API and the reference's
observable behavior; no reference code is copied.
"""

__version__ = "0.1.0"
