"""Round-2 regression tests: compound IF gating, LIKE anchoring, SPLIT
literal separators, NOT(IN subquery), the IN-subquery semi-join path, the
crosstab cardinality guard, array-val fan-out semantics, and streaming
replay exactly-once."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Row, functions as F

from zenodb_spark.engine import DB
from zenodb_spark.streaming.ingest import ingest_stream_batch

EPOCH = dt.datetime(2015, 1, 1, tzinfo=dt.timezone.utc)
E = EPOCH.timestamp()


def ts(off: float) -> dt.datetime:
    return dt.datetime.fromtimestamp(E + off, dt.timezone.utc)


@pytest.fixture(scope="module")
def db(spark):
    db = DB(spark, now=E + 100)
    db.apply_schema(
        {
            "metrics": {
                "retentionperiod": "1h",
                "sql": (
                    "SELECT ok, total,"
                    " IF(status = 'ok', SUM(n) / COUNT(n)) AS ok_rate,"
                    " IF(status = 'ok', SUM(n)) AS ok_n "
                    "FROM inbound GROUP BY host, period('10s')"
                ),
            }
        }
    )
    rows = [
        Row(ts=ts(1), host="a.example.com", status="ok", n=10.0, ok=1.0, total=1.0),
        Row(ts=ts(2), host="a.example.com", status="ok", n=20.0, ok=1.0, total=1.0),
        Row(ts=ts(3), host="a.example.com", status="err", n=99.0, ok=0.0, total=1.0),
        Row(ts=ts(4), host="b.example.org", status="ok", n=6.0, ok=1.0, total=1.0),
        Row(ts=ts(5), host="za", status="err", n=1.0, ok=0.0, total=1.0),
    ]
    db.insert("inbound", spark.createDataFrame(rows))
    return db


def test_if_around_compound_expression(db):
    """IF(cond, SUM(a)/COUNT(a)): the gate must reach BOTH leaves at ingest
    (reference expr/combined_test.go IF(ge, DIV(mult, count)))."""
    out = db.query("SELECT ok_rate, ok_n FROM metrics GROUP BY host, period('100s')")
    rows = {r["host"]: r for r in out.collect()}
    # host a: ok points n=10,20 → sum 30 count 2 → 15; the err n=99 is gated off
    assert abs(rows["a.example.com"]["ok_rate"] - 15.0) < 1e-9
    assert rows["a.example.com"]["ok_n"] == 30.0
    # host za: only an err point → gated SUM reads 0, ratio is 0/0 → null/0
    assert (rows["za"]["ok_rate"] or 0.0) == 0.0


def test_query_time_compound_if(db):
    """Query-time IF over a compound of stored fields also gates each leaf."""
    out = db.query(
        "SELECT IF(host = 'a.example.com', ok / total) AS a_rate "
        "FROM metrics GROUP BY _, period('100s')"
    )
    r = out.collect()[0]
    # ok=3 (a:2, b:1) total=5 overall, but gated to host a: ok=2, total=3
    assert abs(r["a_rate"] - 2.0 / 3.0) < 1e-9


def test_like_is_anchored(db):
    """'a%z' must NOT match 'za' (SQL LIKE, not substring-contains)."""
    out = db.query(
        "SELECT total FROM metrics WHERE host LIKE 'a%z' GROUP BY host, period('100s')"
    )
    assert out.count() == 0
    out = db.query(
        "SELECT total FROM metrics WHERE host LIKE 'a%com' GROUP BY host, period('100s')"
    )
    hosts = [r["host"] for r in out.collect()]
    assert hosts == ["a.example.com"]
    out = db.query(
        "SELECT total FROM metrics WHERE host NOT LIKE '%example%' "
        "GROUP BY host, period('100s')"
    )
    assert [r["host"] for r in out.collect()] == ["za"]


def test_split_literal_separator(db):
    """SPLIT(host, '.', 0) splits on dots, not on every character."""
    out = db.query(
        "SELECT total FROM metrics WHERE host = 'a.example.com' "
        "GROUP BY SPLIT(host, '.', 1) AS part, period('100s')"
    )
    assert [r["part"] for r in out.collect()] == ["example"]


def test_not_in_subquery(db):
    """WHERE NOT (dim IN (SELECT ...)) resolves the subquery under DimNot."""
    out = db.query(
        "SELECT total FROM metrics WHERE NOT (host IN "
        "(SELECT host FROM metrics GROUP BY host, period('100s') HAVING ok_n > 0))"
        " GROUP BY host, period('100s')"
    )
    assert [r["host"] for r in out.collect()] == ["za"]


def test_in_subquery_semi_join_path(db):
    """Above in_splice_max the planner joins the subquery's distinct values
    instead of collecting them — results identical to the splice path."""
    sql = (
        "SELECT total FROM metrics WHERE host IN "
        "(SELECT host FROM metrics GROUP BY host, period('100s') HAVING ok_n > 0)"
        " GROUP BY host, period('100s')"
    )
    spliced = {(r["host"], r["total"]) for r in db.query(sql).collect()}
    old = db.in_splice_max
    try:
        db.in_splice_max = 0  # force every subquery onto the join path
        joined_df = db.query(sql)
        joined = {(r["host"], r["total"]) for r in joined_df.collect()}
        # the membership join must appear in the physical plan
        plan = joined_df._jdf.queryExecution().executedPlan().toString()
        assert "Join" in plan
    finally:
        db.in_splice_max = old
    assert joined == spliced == {("a.example.com", 3.0), ("b.example.org", 1.0)}


def test_crosstab_cardinality_guard(db):
    old = db.crosstab_max_values
    try:
        db.crosstab_max_values = 1
        with pytest.raises(ValueError, match="distinct values"):
            db.query(
                "SELECT total FROM metrics GROUP BY period('100s'), CROSSTAB(host)"
            ).collect()
    finally:
        db.crosstab_max_values = old


def test_array_val_fanout_scalar_not_inflated(spark):
    """A point carrying a scalar val AND an n-element array val contributes
    the scalar once and counts as n points (reference insert.go:213–252:
    element[0] rides the main insert; later elements are measure-only
    sub-inserts)."""
    db = DB(spark, now=E + 100)
    db.apply_schema(
        {
            "arr": {
                "retentionperiod": "1h",
                "sql": (
                    "SELECT s, PERCENTILE(p, 50, 0, 100, 0) AS p50, _points "
                    "FROM inbound GROUP BY dim, period('10s')"
                ),
            }
        }
    )
    rows = [
        Row(ts=ts(1), dim="x", s=7.0, p=[10.0, 20.0, 30.0]),
        Row(ts=ts(2), dim="x", s=5.0, p=None),
    ]
    db.insert("inbound", spark.createDataFrame(rows))
    out = db.query("SELECT s, p50, _points FROM arr GROUP BY dim, period('100s')")
    r = out.collect()[0]
    assert r["s"] == 12.0  # 7 + 5, NOT inflated by the array fan-out
    assert r["_points"] == 4.0  # 3 array elements + 1 scalar-only point
    assert abs(r["p50"] - 20.0) <= 1.0


def test_watch_schema_live_reapply(spark, tmp_path):
    """Schema-file polling: a view added to the file while the DB is live
    becomes queryable without restarting (reference schema.go:16–55)."""
    import time

    path = str(tmp_path / "schema.yaml")
    base = (
        "watched:\n"
        "  retentionperiod: 1h\n"
        "  sql: >\n"
        "    SELECT v FROM inbound GROUP BY k, period('10s')\n"
    )
    with open(path, "w") as f:
        f.write(base)
    db = DB(spark, now=E + 100)
    watch = db.watch_schema(path, interval=0.2)
    try:
        db.insert("inbound", spark.createDataFrame([Row(ts=ts(1), k="a", v=3.0)]))
        assert db.query("SELECT v FROM watched GROUP BY k, period('100s')").count() == 1
        with open(path, "w") as f:
            f.write(
                base
                + "watched_view:\n"
                "  view: true\n"
                "  retentionperiod: 1h\n"
                "  sql: >\n"
                "    SELECT v FROM watched GROUP BY k, period('10s')\n"
            )
        deadline = time.time() + 10
        while "watched_view" not in db.tables and time.time() < deadline:
            time.sleep(0.1)
        assert "watched_view" in db.tables
        db.insert("inbound", spark.createDataFrame([Row(ts=ts(2), k="b", v=4.0)]))
        out = db.query("SELECT v FROM watched_view GROUP BY k, period('100s')")
        assert {r["k"] for r in out.collect()} == {"b"}
    finally:
        watch.stop()


def test_stream_replay_does_not_double_count(spark, tmp_path):
    """Replaying a micro-batch (crash between part write and checkpoint
    commit) replaces the part instead of appending a duplicate; a batch
    already folded by compact() is skipped."""
    wd = str(tmp_path / "store")
    db = DB(spark, workdir=wd, now=E + 100)
    db.apply_schema(
        {
            "sums": {
                "retentionperiod": "1h",
                "sql": "SELECT v FROM inbound GROUP BY k, period('10s')",
            }
        }
    )
    table = db.tables["sums"]
    batch = spark.createDataFrame([Row(ts=ts(1), k="a", v=3.0), Row(ts=ts(2), k="a", v=4.0)])

    def total() -> float:
        out = db.query("SELECT v FROM sums GROUP BY k, period('100s')")
        return sum(r["v"] for r in out.collect())

    ingest_stream_batch(db, table, "sums", batch, batch_id=0)
    assert total() == 7.0
    ingest_stream_batch(db, table, "sums", batch, batch_id=0)  # replay
    assert total() == 7.0
    assert len(table._parts) == 1
    table.compact()
    ingest_stream_batch(db, table, "sums", batch, batch_id=0)  # late replay
    assert total() == 7.0
    ingest_stream_batch(db, table, "sums", batch, batch_id=1)  # genuinely new
    assert total() == 14.0


def test_countdistinct_mergeable_state(spark):
    """COUNTDISTINCT: HLL sketch states must merge across parts AND across
    buckets — distinct-of-union, not sum-of-distincts. Two inserts share
    user 1; hourly→daily re-aggregation must not double-count it."""
    db2 = DB(spark, now=E + 7200)
    db2.apply_schema(
        {
            "m": {
                "sql": (
                    "SELECT COUNTDISTINCT(u) AS du, COUNT(v) AS cnt "
                    "FROM pts GROUP BY g, period('1h')"
                ),
                "retentionperiod": "48h",
            }
        }
    )
    rows1 = [Row(ts=ts(10), g="a", u=1.0, v=1.0), Row(ts=ts(20), g="a", u=2.0, v=1.0)]
    rows2 = [Row(ts=ts(30), g="a", u=1.0, v=1.0), Row(ts=ts(3700), g="a", u=3.0, v=1.0)]
    db2.insert("pts", spark.createDataFrame(rows1))
    db2.insert("pts", spark.createDataFrame(rows2))  # separate part: union-merge
    hourly = {
        r["_time"].minute + r["_time"].hour * 60: r["du"]
        for r in db2.query("SELECT du FROM m GROUP BY g, period('1h')").collect()
    }
    assert hourly == {0: 2.0, 60: 1.0}  # hour 0: users {1,2}; hour 1: {3}
    daily = db2.query("SELECT du, cnt FROM m GROUP BY g, period('1d')").collect()
    assert len(daily) == 1
    # distinct over the union {1,2,3} — NOT 2+1=3-by-luck: user 1 appears
    # in both parts of hour 0, so a sum-of-counts would give 4
    assert daily[0]["du"] == 3.0
    assert daily[0]["cnt"] == 4.0
