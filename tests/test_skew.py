"""operators/skew: salted join + skew-safe distinct — result parity with
the unsalted forms, determinism across retries (md5 salt, not rand), and
the plan shapes the 100 TB rationale depends on."""

from __future__ import annotations

import re

from pyspark.sql import Row, functions as F

from zenodb_spark.operators.skew import distinct_count_skew, salted_join


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _skewed(spark):
    # key 'hot' carries 500 rows, the rest 1 each
    rows = [Row(k="hot", v=i) for i in range(500)] + [
        Row(k=f"cold{i}", v=i) for i in range(50)
    ]
    dim = [Row(k="hot", d="H")] + [Row(k=f"cold{i}", d=f"D{i}") for i in range(50)]
    return spark.createDataFrame(rows), spark.createDataFrame(dim)


def test_salted_inner_matches_plain_join(spark):
    fact, dim = _skewed(spark)
    plain = fact.join(dim, ["k"]).select("k", "v", "d")
    salted = salted_join(fact, dim, ["k"], n_salts=4, salt_from="v").select(
        "k", "v", "d"
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_left_keeps_unmatched(spark):
    fact, dim = _skewed(spark)
    extra = fact.union(spark.createDataFrame([Row(k="orphan", v=-1)]))
    out = salted_join(extra, dim, ["k"], n_salts=4, salt_from="v", how="left")
    orphan = [r for r in out.collect() if r.k == "orphan"]
    assert len(orphan) == 1 and orphan[0].d is None


def test_salt_is_deterministic_not_rand(spark):
    """Two evaluations of the same plan must salt identically — a rand()
    salt breaks under task retry. No rand in the plan; two runs agree."""
    fact, dim = _skewed(spark)
    out = salted_join(fact, dim, ["k"], n_salts=4, salt_from="v")
    assert "rand" not in _plan(out).lower()
    a = sorted(map(tuple, out.collect()))
    b = sorted(map(tuple, out.collect()))
    assert a == b


def test_salted_join_replicates_right_and_widens_key(spark):
    fact, dim = _skewed(spark)
    out = salted_join(fact, dim, ["k"], n_salts=4, salt_from="v")
    plan = _plan(out)
    assert "explode" in plan.lower()  # right-side replication
    # the join's hash exchanges must include the salt column
    assert re.search(r"hashpartitioning\([^)]*__salt", plan)


def test_salted_join_rejects_unsupported_how(spark):
    fact, dim = _skewed(spark)
    try:
        salted_join(fact, dim, ["k"], how="right")
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_distinct_count_skew_matches_count_distinct(spark):
    fact, _ = _skewed(spark)
    df = fact.union(fact)  # duplicates must not double-count
    safe = {
        r.k: r.n_distinct
        for r in distinct_count_skew(df, ["k"], "v").collect()
    }
    ref = {
        r.k: r.n
        for r in df.groupBy("k").agg(F.count_distinct("v").alias("n")).collect()
    }
    assert safe == ref


def test_distinct_count_skew_dedupe_exchange_is_wide(spark):
    fact, _ = _skewed(spark)
    plan = _plan(distinct_count_skew(fact, ["k"], "v"))
    # first exchange on (k, v) — the wide key — then one on k
    assert re.search(r"hashpartitioning\(k[^)]*, v", plan)


def test_aqe_skew_join_split_fires(spark):
    """The FIRST skew defense is AQE's runtime split (session.py enables
    it): a hot-key sort-merge join must show SortMergeJoin(skew=true)
    with an 'AQEShuffleRead … skewed' input in the FINAL adaptive plan.
    Pinned details that cost a debug cycle: the final plan is only
    attached to the DataFrame you EXECUTE (count() runs a different
    QueryExecution — collect this df and re-read its plan), and the
    skew thresholds must be tuned down to fixture scale."""
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    }
    saved = {}
    for k, v in confs.items():
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
        spark.conf.set(k, v)
    try:
        left = spark.range(0, 220_000).select(
            F.when(F.col("id") < 200_000, 0)
            .otherwise((F.col("id") % 1000) + 1)
            .alias("k"),
            F.col("id").alias("v"),
        )
        right = spark.range(0, 1001).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("d")
        )
        out = left.join(right, "k")
        assert len(out.collect()) == 220_000
        plan = _plan(out)
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
