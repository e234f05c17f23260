"""Corpus-curation CLI: chain the training-data pipeline operators over a
parquet corpus from the command line (extension beyond the reference — its
zenotool covers table maintenance; this is the curation counterpart for the
documents side).

Usage:
    python -m zenodb_spark.pipeline_cli --input docs.parquet --output out/ \
        --ops dedup,paragraph_dedup,langid,quality,resample [--text-col text]
        [--id-col doc_id] [--report]

Ops (applied in the given order; each is the oracle-gated operator behind
the matching q-query):
    dedup           exact dedup, keep lowest id          (q23/q40)
    dedup_best      exact dedup, keep highest-TTR copy   (q67)
    paragraph_dedup drop repeated 20-token paragraphs    (q60)
    pii             scrub emails/IPs/phones              (q45)
    langid          attach lang_pred column              (q29)
    quality         attach quality-feature columns       (q28)
    resample        TTR-weighted deterministic sampling  (q65)

`--report` prints per-op row counts instead of writing output.
"""

from __future__ import annotations

import argparse
import sys


def _apply_op(df, op: str, text_col: str, id_col: str):
    from pyspark.sql import functions as F

    from zenodb_spark.operators.dedup import dedup_apply, normalize_text
    from zenodb_spark.operators.pipeline import paragraph_dedup, pii_scrub
    from zenodb_spark.operators.textstats import langid, quality_features

    if op == "dedup":
        return dedup_apply(df, text_col, id_col)
    if op == "dedup_best":
        toks = F.split(normalize_text(text_col), " ")
        ttr = F.size(F.array_distinct(toks)).cast("double") / F.size(toks)
        return dedup_apply(
            df.withColumn("__ttr", ttr), text_col, id_col, priority=[F.desc("__ttr")]
        ).drop("__ttr")
    if op == "paragraph_dedup":
        cleaned = paragraph_dedup(df, text_col, id_col)
        return df.join(
            cleaned.select(F.col("doc").alias(id_col), "kept_chunks", "dropped_chunks"),
            id_col,
        )
    if op == "pii":
        return df.join(
            pii_scrub(df, text_col, id_col).select(
                F.col("doc").alias(id_col), "n_emails", "n_ips", "n_phones"
            ),
            id_col,
        )
    if op == "langid":
        return langid(df, text_col)  # appends pred_lang
    if op == "quality":
        return quality_features(df, text_col)  # appends counts/ratios/score
    if op == "resample":
        toks = F.split(normalize_text(text_col), " ")
        u = F.conv(
            F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10
        ).cast("long") / F.lit(4294967296.0)
        ttr = F.size(F.array_distinct(toks)).cast("double") / F.size(toks)
        return df.filter(F.size(toks) > 0).filter(u < ttr)
    raise SystemExit(f"unknown op {op!r}")


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="zenodb-spark-pipeline", description=__doc__)
    ap.add_argument("--input", required=True, help="input parquet path")
    ap.add_argument("--output", default=None, help="output parquet path")
    ap.add_argument("--ops", required=True, help="comma-separated op chain")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--report", action="store_true", help="print per-op counts only")
    args = ap.parse_args(argv)

    from zenodb_spark.session import get_spark

    spark = get_spark("zenodb_spark_pipeline")
    df = spark.read.parquet(args.input)
    print(f"input: {df.count()} rows", file=sys.stderr)
    for op in [o.strip() for o in args.ops.split(",") if o.strip()]:
        df = _apply_op(df, op, args.text_col, args.id_col)
        if args.report:
            print(f"after {op}: {df.count()} rows", file=sys.stderr)
    if args.output:
        df.write.mode("overwrite").parquet(args.output)
        print(f"wrote {args.output}", file=sys.stderr)
    elif not args.report:
        print(f"final: {df.count()} rows", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
