"""Round-4 additions: gaps-and-islands streaks, sequence packing, PQ
encoding, DSIR weights, ANN recall harness, streaming keyed-state dedup."""

from __future__ import annotations

import pytest
from pyspark.sql import Row, functions as F


def test_streak_islands_exact(spark):
    # user 1: days 0,1,2 then 10,11 -> longest 3, active 5
    # user 2: single day -> longest 1, active 1
    rows = [Row(user_id=1, day=d) for d in (0, 1, 2, 10, 11)] + [
        Row(user_id=2, day=7)
    ]
    ev = spark.createDataFrame(rows).select(
        "user_id",
        (F.col("day") * F.lit(86400) * F.lit(1_000_000_000)).alias("ts_ns"),
    )
    from pyspark.sql.window import Window

    days = ev.select(
        "user_id", F.expr("ts_ns div 86400000000000").cast("long").alias("day")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    isl = days.withColumn("island", F.col("day") - F.row_number().over(w))
    streaks = (
        isl.groupBy("user_id", "island")
        .agg(F.count(F.lit(1)).alias("len"))
        .groupBy("user_id")
        .agg(F.max("len").alias("longest"), F.sum("len").alias("active"))
    )
    got = {r["user_id"]: (r["longest"], r["active"]) for r in streaks.collect()}
    assert got == {1: (3, 5), 2: (1, 1)}


def test_pq_assign_reconstruction_identity(spark):
    """A vector equal to one of the codewords in every subspace must be
    assigned that codeword with (near-)zero quantization error."""
    from zenodb_spark.operators.similarity import pq_assign, pq_codebooks

    cbs = pq_codebooks(8, 2, 4, seed=7)
    exact = [x for sub in (cbs[0][2], cbs[1][2]) for x in sub]
    df = spark.createDataFrame([(1, exact)], "vec_id int, embedding array<double>")
    out = {
        (r["subspace"], r["code"]): r["err_micro"]
        for r in pq_assign(df, cbs).collect()
    }
    assert set(out) == {(1, 3), (2, 3)}
    assert all(abs(v) <= 1 for v in out.values())  # micro-rounded ~0


def test_pq_assign_one_row_per_subspace(spark):
    from zenodb_spark.operators.similarity import pq_assign, pq_codebooks

    cbs = pq_codebooks(8, 4, 3, seed=9)
    df = spark.createDataFrame(
        [(i, [float(i + j) for j in range(8)]) for i in range(5)],
        "vec_id int, embedding array<double>",
    )
    out = pq_assign(df, cbs)
    assert out.count() == 20
    assert out.groupBy("vec_id").count().filter("count != 4").count() == 0


def test_sequence_packing_cumsum_determinism(spark):
    """Packing is a pure function of (source, doc_id, n_tok): same input,
    any partitioning -> same (seq_id, doc) assignment."""
    from zenodb_spark.queries import QUERIES

    a = QUERIES["q104_sequence_packing"](spark, "/root/testdata/sf0.001")
    b = QUERIES["q104_sequence_packing"](
        spark, "/root/testdata/sf0.001"
    ).repartition(13)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_ann_recall_bounds(spark):
    from zenodb_spark.queries import QUERIES

    rows = QUERIES["q109_ann_recall"](spark, "/root/testdata/sf0.01").collect()
    assert len(rows) == 10
    for r in rows:
        assert 0.0 <= r["recall"] <= 1.0
        assert r["n_matched"] <= r["k"]


def test_stream_dedup_first_single_emit_per_key(spark, tmp_path):
    """Cross-batch: a key seen in batch 1 must NOT re-emit in batch 2."""
    from zenodb_spark.streaming.stateful import stream_dedup_first

    src = str(tmp_path / "src")
    spark.createDataFrame(
        [(1, "a"), (2, "a")], "event_id long, k string"
    ).coalesce(1).write.parquet(src)
    spark.createDataFrame(
        [(3, "a"), (4, "b")], "event_id long, k string"
    ).coalesce(1).write.mode("append").parquet(src)
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    out = stream_dedup_first(stream, "k", ["event_id"])
    q = (
        out.writeStream.format("memory")
        .queryName("t_r4_dedup")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        (r["k"], r["event_id"]) for r in spark.table("t_r4_dedup").collect()
    )
    # one emit per key; key 'a' kept its smallest event_id from its first batch
    assert [k for k, _ in got] == ["a", "b"]
    a_id = dict(got)["a"]
    assert a_id in (1, 3)  # file->batch order is not guaranteed, emit-once is
    assert dict(got)["b"] == 4


def test_ab_lift_variants_partition_users(spark):
    from zenodb_spark.queries import QUERIES

    rows = QUERIES["q101_ab_lift"](spark, "/root/testdata/sf0.01").collect()
    assert sorted(r["variant"] for r in rows) == [0, 1]
    assert sum(r["n_users"] for r in rows) == 150
    for r in rows:
        assert 0 <= r["n_converted"] <= r["n_users"]


def test_export_shards_stable_and_complete(spark, tmp_path):
    from zenodb_spark.sources.export import (
        export_training_shards,
        shard_manifest,
        shard_of,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    p1, p2 = str(tmp_path / "e1"), str(tmp_path / "e2")
    export_training_shards(docs, p1, 8)
    export_training_shards(docs.repartition(7), p2, 8)  # different input layout

    m1 = {r["shard"]: (r["n_rows"], r["content_sum"]) for r in shard_manifest(spark, p1).collect()}
    m2 = {r["shard"]: (r["n_rows"], r["content_sum"]) for r in shard_manifest(spark, p2).collect()}
    assert m1 == m2  # assignment independent of input partitioning
    assert sum(n for n, _ in m1.values()) == docs.count()
    assert set(m1) <= set(range(8))

    # in-shard order is pinned: same sequence on two independent reads
    import glob

    shard0 = sorted(glob.glob(f"{p1}/shard=*/"))[0]
    a = [r["doc_id"] for r in spark.read.parquet(shard0).collect()]
    b = [r["doc_id"] for r in spark.read.parquet(shard0).collect()]
    assert a == b and len(a) > 0

    # assignment matches the documented rule
    got = spark.read.parquet(p1).select("doc_id", F.col("shard").cast("long").alias("s"))
    want = docs.select("doc_id", shard_of("doc_id", 8).alias("w"))
    assert got.join(want, "doc_id").filter("s != w").count() == 0
