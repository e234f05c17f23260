"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Timing excludes session startup; each query is fully materialized via a
count-collect (foreach-noop) so the measured cost is the real plan.

Methodology (steady-state query latency, not first-compile latency):
- every headline query first runs once, untimed, at sf0.001 — this compiles
  the whole-stage-codegen classes and warms the JIT, which otherwise
  dominates local measurements (2-10 s of Janino/C2 time on the FIRST run
  of a plan shape, pure noise w.r.t. the 100 TB question);
- any cache an operator persists during a timed query (e.g. MinHash's
  shingle arrays) is unpersisted before the next query, so one query's
  leftover executor-memory footprint cannot skew its neighbors; the engine
  DB's stored aggregate tables stay persisted — they ARE the store.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from zenodb_spark import queries as Q
from zenodb_spark.session import get_spark

HEADLINE = [
    "q01_sum_period",
    "q06_having",
    "q09_crosstab",
    "q11_shift",
    "q13_percentile",
    "q14_percentile_sketch",
    "q15_in_subquery",
    "q21_pricing_summary",
    "q22_join_enrich",
    "q24_ngram_jaccard",
    "q25_minhash_lsh",
    "q26_simhash",
    "q27_ann_cosine",
    "q28_text_quality",
    "q32_embed_neardup",
    "q33_ann_lsh",
    "q35_shipping_priority",
    "q36_revenue_by_nation",
    "q44_chunk_documents",
    "q46_decontaminate",
    "q47_dedup_clusters",
    "q48_repetition",
    "q60_paragraph_dedup",
    "q61_decontaminate_bloom",
    "q62_unigram_logprob",
    "q63_kmeans_step",
    "q64_bm25_topk",
    "q66_containment",
    "q68_funnel",
    "q70_anomaly_zscore",
    "q71_tfidf_keywords",
    "q72_bigram_logprob",
    "q73_source_overlap",
    "q100_activity_streaks",
    "q103_trade_flows",
    "q106_dsir_weights",
    "q107_pq_codes",
    "q114_customer_distribution",
    "q117_small_quantity_revenue",
    "q121_suppliers_at_fault",
    "q122_order_value_deciles",
    "q124_cooccurrence_salted",
    "q127_bucketed_join",
    "q128_time_weighted_avg",
    "q129_gapfill_locf",
    "q153_interval_join",
    "q154_heavy_hitters",
    "q155_pagerank",
    "q162_cdc_chunks",
    "q165_dup_span_strike",
    "q179_domain_cap",
    "q180_contamination_frac",
    "q182_filter_funnel",
    "q183_heaps_growth",
    "q184_zipf_slope",
    "q185_stratified_sample",
    "q187_rrf_hybrid",
    "q188_gopher_rules",
    "q192_length_ks",
    "q196_source_lang_chi2",
    "q197_hapax_rate",
    "q202_sketch_calibration",
    "q205_matryoshka_recall",
    "q213_media_dedup",
    "q221_min_cost_supplier",
    "q223_retrieval_eval",
    "q224_k_anonymity",
    "z01_engine_rollup_sketch",
    "z02_engine_shift",
    "z06_engine_crosstab",
    "z15_engine_set_ops",
]


def _persistent_ids(sc) -> set:
    return set(sc._jsc.getPersistentRDDs().keySet().toArray())


def _unpersist_new(sc, protected: set) -> None:
    jmap = sc._jsc.getPersistentRDDs()
    for rid in list(jmap.keySet().toArray()):
        if rid not in protected:
            jmap.get(rid).unpersist(False)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("zenodb_spark_bench")
    sc = spark.sparkContext
    # warm the JVM + parquet footers with a trivial action
    Q.QUERIES["q01_sum_period"](spark, sf_dir).limit(1).collect()
    # materialize the engine DB's stored aggregate tables outside the timed
    # region: z-queries measure QUERY latency over stored state — ingest is
    # the streaming pipeline's job, exactly as the reference pre-aggregates
    # at insert time and its queries read the memstore/filestore
    Q._engine_db(spark, sf_dir)
    for t in Q._ENGINE_CACHE[sf_dir].tables.values():
        t.state_df().count()
    protected = _persistent_ids(sc)

    # SPARK_GRAFT_BENCH_QUERIES: comma-separated subset override, used by
    # the sf10 scale rehearsal to bench the linear/planned operators
    # without paying the (documented, spec-quadratic) oracle-proof queries
    # at a scale they were never meant to run at.
    subset = os.environ.get("SPARK_GRAFT_BENCH_QUERIES")
    headline = [q for q in subset.split(",") if q] if subset else HEADLINE

    # untimed warm-up: compile every headline plan shape once at sf0.001
    warm_dir = str(Path(sf_dir).parent / "sf0.001")
    if os.path.isdir(warm_dir) and warm_dir != sf_dir:
        for name in headline:
            try:
                Q.QUERIES[name](spark, warm_dir).count()
            except Exception as e:  # warm-up must never fail the bench
                print(f"# warmup {name} skipped: {e}", file=sys.stderr)
        _unpersist_new(sc, protected)
        # the warm-up builds a second engine DB at sf0.001; its state is
        # protected from here on (tiny) so timed z-queries don't rebuild it
        protected = _persistent_ids(sc)

    # min over N timed passes: the local box's effective CPU speed swings
    # 2-3x with co-tenant load (measured: identical q25 plan 15.6s vs 121s
    # minutes apart), so a single sample conflates plan cost with ambient
    # noise; the per-query minimum is the steady-state latency estimate
    # 3 passes: ambient co-tenant load swings this box 3-5x on multi-minute
    # scales (measured: q32 28.2s in two adjacent bench passes, 1.2-2.6s in
    # every controlled re-run); min-of-3 makes one bad window survivable
    passes = int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "3"))
    timings: dict[str, float] = {}
    for p in range(passes):
        for name in headline:
            t0 = time.perf_counter()
            df = Q.QUERIES[name](spark, sf_dir)
            n = df.count()
            dt = round(time.perf_counter() - t0, 3)
            timings[name] = min(timings.get(name, dt), dt)
            _unpersist_new(sc, protected)
            print(f"# pass{p} {name}: {dt:.3f}s ({n} rows)", file=sys.stderr)

    # ingest throughput (reference instruments points/sec per table,
    # insert.go:109-117, but publishes no figure): batch-insert the events
    # table into a fresh engine DB, through the full ingest lowering
    # (array fan-out, WHERE/IF gates, partial-state aggregation), then
    # compact — rows/sec over the whole path. Extra metric; not part of
    # the headline total so cross-round query comparability holds.
    from zenodb_spark.engine import DB

    ev = Q.load_table(spark, sf_dir, "events")
    n_events = ev.count()  # outside the timed region
    t0 = time.perf_counter()
    idb = DB(spark)
    idb.apply_schema(Q._ENGINE_SCHEMA)
    idb.insert("events", ev)
    for t in idb.tables.values():
        t.compact()
    ingest_sec = time.perf_counter() - t0
    ingest_rps = round(n_events / ingest_sec, 1)
    print(f"# ingest: {n_events} rows in {ingest_sec:.2f}s = {ingest_rps} rows/s",
          file=sys.stderr)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "ingest_rows_per_sec": ingest_rps,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
