"""zenodb_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of getlantern/zenodb (time-series DB storing
only pre-aggregated data), re-expressed Spark-first.

Architecture (see SURVEY.md §7):

- ``session``    — tuned SparkSession factory (AQE, Arrow, UTC, pushdown).
- ``catalog``    — loaders for the driver testdata star schema + events.
- ``functions``  — measure expressions (IF/BOUNDED/WAVG/safe-div/LOG*) and
                   dimension expressions (CONCAT/SPLIT/.../DECODE) mirroring
                   the reference's expr/ and goexpr surface.
- ``operators``  — time ops (period/stride/shift/crosshift/as-of), crosstab,
                   percentile (exact + mergeable histogram sketch), top-k,
                   dedup family (exact/MinHash/SimHash/Jaccard/containment/
                   paragraph/priority + connected components), similarity
                   search (brute-force/LSH/IVF + k-means training), BM25
                   retrieval, text analysis (quality/langid/LM scoring/
                   TF-IDF/PMI/entropy), pipeline ops (chunking/PII/
                   decontamination/sampling), distributed prefix scan,
                   multimodal plumbing (decode/resize/frame-sample/embed).
- ``ir`` / ``sqlparser`` / ``plans`` — the ZenoDB SQL dialect (plus set
                   ops) parsed to a Query IR and compiled to DataFrame
                   pipelines.
- ``engine``     — DB facade: schema registry, tables as materialized
                   aggregates with mergeable state columns, insert + query
                   + explain + coalesced query_many + table_stats.
- ``streaming``  — Structured Streaming ingest (partial-state append
                   model), watermarked rollups, custom keyed-state ops
                   (cross-batch dedup, counters, z-score alerts).

Everything here derives from the public Apache Spark API and the reference's
observable behavior; no reference code is copied.
"""

__version__ = "0.1.0"
