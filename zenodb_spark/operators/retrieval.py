"""Distributed lexical retrieval: BM25 scoring over a document corpus.

Extension beyond the reference (no retrieval surface exists there): the
text-side counterpart of the ANN operators — the standard first-stage
retriever of a RAG / data-curation pipeline, expressed as pure DataFrame
aggregations and joins (no UDFs, no driver-side index).

Cross-engine determinism follows the repo convention: every ln() output is
quantized to integer micro-units per DISTINCT token (idf), every per-term
score is quantized before the per-document summation, so aggregate values
are exact integer sums and rank order is defined on integers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from zenodb_spark.operators.dedup import normalize_text
from zenodb_spark.operators.util import spread


def bm25_topk(
    corpus: DataFrame,
    queries: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    qid_col: str = "qid",
    qtext_col: str = "text",
    k1: float = 1.5,
    b: float = 0.75,
    topk: int = 10,
) -> DataFrame:
    """Top-k corpus documents per query by Okapi BM25.

    idf(t) = ln((N − df + 0.5)/(df + 0.5) + 1)  (Robertson–Sparck Jones,
    the Lucene form — always positive); score(q,d) = Σ_t idf·tf·(k1+1) /
    (tf + k1·(1 − b + b·dl/avgdl)).

    Scale shape: corpus token stats are two hash aggregates (doc-token tf,
    token df); the query side joins on token — a shuffle of corpus tf rows
    for the query vocabulary only (Catalyst pushes the semi-join of query
    tokens into the scan side under AQE); ranking is a per-query top-k
    window on integer scores (map-side WindowGroupLimit prunes to k rows
    per partition before the final exchange). No driver-side index, no
    cross join; the inverted index IS the tf DataFrame.
    """
    toks = spread(corpus).select(
        F.col(id_col).alias("doc"),
        F.explode(F.split(normalize_text(text_col), " ")).alias("tok"),
    ).filter(F.length("tok") > 0)
    tf = toks.groupBy("doc", "tok").agg(F.count(F.lit(1)).alias("tf"))
    dl = tf.groupBy("doc").agg(F.sum("tf").alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1)).cast("double")).alias(
            "avgdl"
        ),
    )
    df_t = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    idf = df_t.crossJoin(F.broadcast(stats)).select(
        "tok",
        "avgdl",
        F.floor(
            F.log(
                (F.col("n_docs") - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5))
                + F.lit(1.0)
            )
            * F.lit(1_000_000.0)
            + F.lit(0.5)
        )
        .cast("long")
        .alias("idf_micro"),
    )
    qtok = (
        queries.select(
            F.col(qid_col).alias("qid"),
            F.explode(F.split(normalize_text(qtext_col), " ")).alias("tok"),
        )
        .filter(F.length("tok") > 0)
        .distinct()
    )
    term = (
        qtok.join(idf, "tok")
        .join(tf, "tok")
        .join(dl, "doc")
        .select(
            "qid",
            "doc",
            F.floor(
                (F.col("idf_micro").cast("double") / F.lit(1_000_000.0))
                * (F.col("tf") * F.lit(k1 + 1.0))
                / (
                    F.col("tf")
                    + F.lit(k1)
                    * (
                        F.lit(1.0 - b)
                        + F.lit(b) * F.col("dl") / F.col("avgdl")
                    )
                )
                * F.lit(1_000_000.0)
                + F.lit(0.5)
            )
            .cast("long")
            .alias("s_micro"),
        )
    )
    scored = term.groupBy("qid", "doc").agg(F.sum("s_micro").alias("score_micro"))
    w = Window.partitionBy("qid").orderBy(F.desc("score_micro"), F.asc("doc"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= topk)
        .select(
            "qid",
            "doc",
            (F.col("score_micro").cast("double") / F.lit(1_000_000.0)).alias(
                "bm25"
            ),
            F.col("rank").cast("long").alias("rank"),
        )
    )
