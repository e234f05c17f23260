"""Live in-place ALTER (reference schema.go poll + table alter semantics):
re-applying a changed definition with the same stream/dims/resolution/
filter keeps stored state; new fields read as absent for pre-ALTER
buckets and accumulate from the next ingest on."""

from __future__ import annotations

import datetime as dt

import pytest

from zenodb_spark.engine import DB

E = dt.datetime(2015, 6, 1, tzinfo=dt.timezone.utc).timestamp()

V1 = {"alt1": {"sql": "SELECT COUNT(value) AS cnt FROM alts GROUP BY event_type, period('1h')"}}
V2 = {
    "alt1": {
        "sql": "SELECT COUNT(value) AS cnt, MAX(value) AS mx FROM alts GROUP BY event_type, period('1h')"
    }
}
V2_REORDERED = {
    "alt1": {
        "sql": "SELECT MAX(value) AS mx, COUNT(value) AS cnt FROM alts GROUP BY event_type, period('1h')"
    }
}
V3_REGROUPED = {
    "alt1": {"sql": "SELECT COUNT(value) AS cnt FROM alts GROUP BY user_id, period('1h')"}
}


def _points(spark, vals, t0=E):
    return spark.createDataFrame(
        [
            {
                "ts": dt.datetime.fromtimestamp(t0 + i, dt.timezone.utc),
                "event_type": "click",
                "user_id": i,
                "value": float(v),
            }
            for i, v in enumerate(vals)
        ]
    )


def test_alter_adds_field_keeps_state(spark):
    db = DB(spark, now=E + 100)
    db.apply_schema(V1)
    t = db.tables["alt1"]
    db.insert("alts", _points(spark, [10.0, 20.0]))

    db.apply_schema(V2)
    assert db.tables["alt1"] is t, "compatible change must ALTER in place"

    # pre-ingest: old buckets read the NEW field as absent (null), cnt kept
    row = db.query("SELECT cnt, mx FROM alt1 GROUP BY _").collect()[0]
    assert row["cnt"] == 2.0
    assert row["mx"] is None

    # new ingest accumulates the new field; cnt spans both ingests
    db.insert("alts", _points(spark, [7.0, 5.0]))
    row = db.query("SELECT cnt, mx FROM alt1 GROUP BY _").collect()[0]
    assert row["cnt"] == 4.0
    assert row["mx"] == 7.0

    # compact folds mixed-schema parts without losing either side
    t.compact()
    row = db.query("SELECT cnt, mx FROM alt1 GROUP BY _").collect()[0]
    assert (row["cnt"], row["mx"]) == (4.0, 7.0)


def test_alter_rejects_reordered_fields(spark):
    db = DB(spark, now=E + 100)
    db.apply_schema(V1)
    db.insert("alts", _points(spark, [1.0]))
    db.apply_schema(V2)  # append: fine
    with pytest.raises(ValueError, match="re-bind stored state"):
        db.apply_schema(V2_REORDERED)


def test_incompatible_change_rebuilds(spark):
    db = DB(spark, now=E + 100)
    db.apply_schema(V1)
    t = db.tables["alt1"]
    db.insert("alts", _points(spark, [1.0]))
    db.apply_schema(V3_REGROUPED)
    assert db.tables["alt1"] is not t, "different grouping must rebuild"


def test_retention_only_change_alters_in_place(spark):
    db = DB(spark, now=E + 100)
    db.apply_schema(V1)
    t = db.tables["alt1"]
    db.insert("alts", _points(spark, [1.0]))
    db.apply_schema({"alt1": {**V1["alt1"], "retentionperiod": "720d"}})
    assert db.tables["alt1"] is t
    assert db.tables["alt1"].tdef.retention == pytest.approx(720 * 86400)


def test_alter_survives_restart_with_workdir(spark, tmp_path):
    """ALTER + restart: a store persisted under the OLD field list reopens
    under the NEW schema (fixed _s__points + allowMissingColumns union), so
    pre-ALTER buckets read the new field as absent after a process bounce."""
    wd = str(tmp_path / "alterdb")
    db1 = DB(spark, workdir=wd, now=E + 100)
    db1.apply_schema(V1)
    db1.insert("alts", _points(spark, [10.0, 20.0]))
    for t in db1.tables.values():
        t.compact()  # persist under V1's columns

    # process bounce: fresh DB straight onto the V2 schema over the store
    db2 = DB(spark, workdir=wd, now=E + 100)
    db2.apply_schema(V2)
    row = db2.query("SELECT cnt, mx FROM alt1 GROUP BY _").collect()[0]
    assert row["cnt"] == 2.0
    assert row["mx"] is None

    db2.insert("alts", _points(spark, [9.0]))
    row = db2.query("SELECT cnt, mx FROM alt1 GROUP BY _").collect()[0]
    assert (row["cnt"], row["mx"]) == (3.0, 9.0)


def test_alter_mid_stream_picks_up_new_field(spark, tmp_path):
    """Live ALTER between micro-batches: the foreachBatch closure holds the
    Table OBJECT, and alter() mutates it in place — so the next incremental
    pass aggregates the new field with no stream restart (the reference's
    watched-schema behavior for a live ingest pipeline)."""
    import shutil

    from zenodb_spark.streaming.ingest import start_table_stream

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    db = DB(spark, now=E + 100)
    db.apply_schema(V1)

    _points(spark, [10.0, 20.0]).write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema
    q = start_table_stream(
        db, "alt1", spark.readStream.schema(schema).parquet(src), checkpoint_dir=ckpt
    )
    q.awaitTermination(120)

    db.apply_schema(V2)  # live ALTER between micro-batches

    _points(spark, [7.0, 5.0], t0=E + 10).write.mode("append").parquet(src)
    q2 = start_table_stream(
        db, "alt1", spark.readStream.schema(schema).parquet(src), checkpoint_dir=ckpt
    )
    q2.awaitTermination(120)

    row = db.query("SELECT cnt, mx FROM alt1 GROUP BY _").collect()[0]
    assert row["cnt"] == 4.0
    assert row["mx"] == 7.0  # max over post-ALTER batches only


def test_explain_returns_physical_plan(spark):
    db = DB(spark, now=E + 100)
    db.apply_schema(V1)
    db.insert("alts", _points(spark, [1.0]))
    txt = db.explain("EXPLAIN SELECT cnt FROM alt1 GROUP BY event_type, period('1h')")
    assert "Physical Plan" in txt and "HashAggregate" in txt
    # bare statement (no EXPLAIN keyword) works too
    assert "Physical Plan" in db.explain("SELECT cnt FROM alt1 GROUP BY event_type")
