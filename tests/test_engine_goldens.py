"""Golden tests mirroring the reference's primary e2e fixture
(zenodb_test.go:99–365 / FIXTURES.md §1): a rich table with IF+SUM, derived
arithmetic, AVG, BOUNDED-AVG, percentiles; scripted inserts; queries with
GROUP BY _, SHIFT, STRIDE, percentile re-read."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Row

from zenodb_spark.engine import DB

EPOCH = dt.datetime(2015, 1, 1, 2, 3, 4, tzinfo=dt.timezone.utc)
E = EPOCH.timestamp() // 1 * 1.0


def ts(off: float) -> dt.datetime:
    return dt.datetime.fromtimestamp(E + off, dt.timezone.utc)


SCHEMA = {
    "test_a": {
        "retentionperiod": "200s",
        "sql": (
            "SELECT "
            " IF(dim_md = 'glub', SUM(i)) AS i,"
            " ii,"
            " i * ii / COUNT(ii) AS iii,"
            " AVG(iv) AS iv,"
            " AVG(BOUNDED(iv, 0, 10)) AS biv,"
            " PERCENTILE(p, 99, 0, 1000, 1) AS pp,"
            " z "
            "FROM inbound WHERE dim_r = 'A' "
            "GROUP BY dim_r, dim_u, dim_b, period('1s')"
        ),
    },
}


@pytest.fixture(scope="module")
def db(spark):
    db = DB(spark, now=E + 100)
    db.apply_schema(SCHEMA)
    rows = [
        # two points in bucket E for (1,true): i=1+11, ii=2+22, iv=10,20(→biv keeps 10)
        Row(ts=ts(0.2), dim_r="A", dim_u=1, dim_b=True, dim_md="glub", i=1.0, ii=2.0, iv=10.0, p=None, z=None),
        Row(ts=ts(0.8), dim_r="A", dim_u=1, dim_b=True, dim_md="glub", i=11.0, ii=22.0, iv=20.0, p=None, z=None),
        # filtered out by WHERE dim_r = 'A'
        Row(ts=ts(0.5), dim_r="dim_b", dim_u=1, dim_b=True, dim_md="glub", i=500.0, ii=500.0, iv=None, p=None, z=None),
        # dim_md not glub → i gated off, ii still counts
        Row(ts=ts(0.5), dim_r="A", dim_u=2, dim_b=False, dim_md="other", i=7.0, ii=3.0, iv=None, p=None, z=None),
        # bucket E+1 for (1,true)
        Row(ts=ts(1.1), dim_r="A", dim_u=1, dim_b=True, dim_md="glub", i=100.0, ii=200.0, iv=None, p=None, z=4.0),
        # percentile samples 0..100 as an array val (fan-out per element)
        Row(ts=ts(1.3), dim_r="A", dim_u=1, dim_b=True, dim_md="glub", i=None, ii=None, iv=None, p=[float(x) for x in range(101)], z=None),
    ]
    db.insert("inbound", spark.createDataFrame(rows))
    return db


def one(df, **dims):
    rows = [r for r in df.collect() if all(r[k] == v for k, v in dims.items())]
    assert len(rows) == 1, f"expected 1 row for {dims}, got {rows}"
    return rows[0]


def test_if_gating_and_sum(db):
    out = db.query("SELECT i, ii FROM test_a GROUP BY dim_u, period('10s')")
    r1 = one(out, dim_u=1)
    assert r1["i"] == 112.0 and r1["ii"] == 224.0
    r2 = one(out, dim_u=2)
    assert r2["i"] == 0.0  # gated off by dim_md <> 'glub' at ingest
    assert r2["ii"] == 3.0


def test_derived_expression(db):
    # iii = i * ii / COUNT(ii) per (dim_u=1, bucket E): 12*24/2
    out = db.query("SELECT iii FROM test_a GROUP BY dim_u, period('1s')")
    rows = [r for r in out.collect() if r["dim_u"] == 1]
    by_time = {r["_time"].timestamp(): r["iii"] for r in rows}
    assert abs(by_time[E] - 12 * 24 / 2) < 0.01
    assert abs(by_time[E + 1] - 100 * 200 / 1) < 0.01


def test_avg_and_bounded_avg(db):
    out = db.query("SELECT iv, biv FROM test_a GROUP BY dim_u, period('100s')")
    r = one(out, dim_u=1)
    assert abs(r["iv"] - 15.0) < 0.01  # AVG(10, 20)
    assert abs(r["biv"] - 10.0) < 0.01  # BOUNDED(0,10) drops the 20


def test_group_by_underscore_points(db):
    out = db.query("SELECT _points, i FROM test_a GROUP BY _, period('100s')")
    rows = out.collect()
    assert len(rows) == 1
    # 4 scalar points + 101 array elements (element[0] rides the main insert:
    # reference insert.go:213–252 counts an n-element array point as n)
    assert rows[0]["_points"] == 105.0
    assert rows[0]["i"] == 112.0  # 1 + 11 + 100 (dim_u=2's i gated off)


def test_percentile_and_reread(db):
    out = db.query(
        "SELECT pp, PERCENTILE(pp, 5) AS pp_5p FROM test_a GROUP BY _, period('100s')"
    )
    r = out.collect()[0]
    assert abs(r["pp"] - 99.0) <= 1.0  # p99 of 0..100
    assert abs(r["pp_5p"] - 5.0) <= 1.0  # re-read stored sketch at p5


def test_presence_underscore(db):
    out = db.query("SELECT IF(dim_u = 1, _) AS present FROM test_a GROUP BY dim_u, period('100s')")
    rows = {r["dim_u"]: r["present"] for r in out.collect()}
    assert rows[1] == 1.0 and rows[2] == 0.0


def test_shift(db):
    out = db.query(
        "SELECT i, SHIFT(i, '1s') AS i_prev FROM test_a GROUP BY dim_u, period('1s')"
    )
    rows = [r for r in out.collect() if r["dim_u"] == 1]
    by_time = {r["_time"].timestamp(): r for r in rows}
    assert by_time[E + 1]["i_prev"] == by_time[E]["i"] == 12.0
    assert by_time[E]["i_prev"] == 0.0


def test_stride(db):
    # stride 2s over 1s resolution: keep only even-second buckets
    out = db.query("SELECT i FROM test_a GROUP BY _, STRIDE('2s')")
    times = sorted(r["_time"].timestamp() % 2 for r in out.collect())
    assert all(t == 0.0 for t in times)


def test_multiple_of_resolution_enforced(db):
    with pytest.raises(ValueError, match="multiple"):
        db.query("SELECT i FROM test_a GROUP BY _, period('1.5s')").collect()


def test_retention_cutoff(db, spark):
    db2 = DB(spark, now=E + 300)  # retention 200s → bucket E expired
    db2.apply_schema(SCHEMA)
    db2.insert(
        "inbound",
        spark.createDataFrame(
            [
                Row(ts=ts(0.5), dim_r="A", dim_u=1, dim_b=True, dim_md="glub", i=1.0, ii=1.0, iv=1.0),
                Row(ts=ts(250.0), dim_r="A", dim_u=1, dim_b=True, dim_md="glub", i=2.0, ii=2.0, iv=2.0),
            ]
        ),
    )
    out = db2.query("SELECT i FROM test_a GROUP BY dim_u, period('1s')")
    rows = out.collect()
    assert len(rows) == 1 and rows[0]["i"] == 2.0


def test_compact_preserves_results(db, spark):
    db3 = DB(spark, now=E + 100)
    db3.apply_schema(SCHEMA)
    mk = lambda i: Row(ts=ts(0.5), dim_r="A", dim_u=1, dim_b=True, dim_md="glub", i=float(i), ii=float(i), iv=float(i))
    db3.insert("inbound", spark.createDataFrame([mk(1)]))
    db3.insert("inbound", spark.createDataFrame([mk(2)]))  # second partial part
    before = db3.query("SELECT i, iv FROM test_a GROUP BY dim_u").collect()[0]
    db3.tables["test_a"].compact()
    assert len(db3.tables["test_a"]._parts) == 1
    after = db3.query("SELECT i, iv FROM test_a GROUP BY dim_u").collect()[0]
    assert before["i"] == after["i"] == 3.0
    assert abs(before["iv"] - after["iv"]) < 0.01 and abs(after["iv"] - 1.5) < 0.01


def test_backfill_limit(spark):
    """Backfill depth bounds historical replay from table creation
    (reference table.go:50-52, 161-167)."""
    db2 = DB(spark, now=E + 300)
    db2.apply_schema(
        {
            "test_bf": {
                "sql": "SELECT i FROM inbound GROUP BY dim_u, period('1s')",
                "backfill": "100s",
            }
        }
    )
    db2.insert(
        "inbound",
        spark.createDataFrame(
            [
                Row(ts=ts(0.5), dim_r="A", dim_u=1, dim_b=True, dim_md="glub", i=1.0, ii=1.0, iv=1.0),
                Row(ts=ts(250.0), dim_r="A", dim_u=1, dim_b=True, dim_md="glub", i=2.0, ii=2.0, iv=2.0),
            ]
        ),
    )
    rows = db2.query("SELECT i FROM test_bf GROUP BY dim_u, period('1s')").collect()
    # creation at E+300, backfill 100s -> points older than E+200 dropped
    assert len(rows) == 1 and rows[0]["i"] == 2.0


def test_kitchen_sink_aggregate_query(db):
    """Mirror of the reference's aggregate e2e query (zenodb_test.go:669–758):
    ASOF/UNTIL + IN-subquery + `_` presence + constants + LOG2/LOG10 +
    ORDER BY dim DESC, over the scripted fixture."""
    import math

    asof = ts(0).strftime("%Y-%m-%dT%H:%M:%SZ")
    until = ts(2).strftime("%Y-%m-%dT%H:%M:%SZ")
    out = db.query(
        # IF at query time gates on STORED dims only (dim_b), matching the
        # reference: ingest-time IF saw raw dims, stored state has group dims
        "SELECT IF(dim_b = true, _) AS present, 5 AS cval, "
        "LOG2(ii) AS l2, LOG10(ii) AS l10, i, ii "
        f"FROM test_a ASOF '{asof}' UNTIL '{until}' "
        "WHERE dim_u IN (SELECT ii FROM test_a GROUP BY dim_u HAVING ii > 2) "
        "GROUP BY dim_u, period('2s') ORDER BY dim_u DESC"
    )
    rows = out.collect()
    assert [r["dim_u"] for r in rows] == [2, 1]
    r2, r1 = rows
    assert r2["i"] == 0.0 and r2["ii"] == 3.0 and r2["present"] == 0.0
    assert r1["i"] == 112.0 and r1["ii"] == 224.0 and r1["present"] == 1.0
    assert all(r["cval"] == 5.0 for r in rows)
    assert abs(r1["l2"] - math.log2(224)) < 1e-9
    assert abs(r1["l10"] - math.log10(224)) < 1e-9


def test_crosstab_having_unselected_field(db):
    """CROSSTAB pivot with HAVING on a field NOT in the SELECT list — the
    synthetic `_having` trick through the pivot (zenodb_test.go:516–536;
    HAVING evaluates on the un-pivoted grain, core/group.go:215–219)."""
    out = db.query(
        "SELECT ii FROM test_a GROUP BY _, CROSSTAB(dim_b), period('2s') HAVING i > 100"
    )
    rows = out.collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["true_ii"] == 224.0 and r["false_ii"] == 3.0
    # HAVING threshold not met → empty
    empty = db.query(
        "SELECT ii FROM test_a GROUP BY _, CROSSTAB(dim_b), period('2s') HAVING i > 1000"
    )
    assert empty.collect() == []


def test_schema_reapply_idempotent(db):
    """Re-applying an unchanged schema (the reference's 1s schema poll,
    schema.go:16-55) keeps stored state; a changed definition rebuilds."""
    before = db.query("SELECT ii FROM test_a GROUP BY dim_u").collect()
    db.apply_schema(SCHEMA)  # unchanged → no-op, data preserved
    after = db.query("SELECT ii FROM test_a GROUP BY dim_u").collect()
    assert sorted(map(str, before)) == sorted(map(str, after))


def test_mismatched_aggregate_rejected(db):
    """Querying SUM over a stored AVG field is an error — a field IS its
    aggregation (reference README.md:239-249)."""
    with pytest.raises(ValueError, match="does not match any stored field"):
        db.query("SELECT SUM(iv) AS x FROM test_a GROUP BY dim_u").collect()


def test_stride_with_period_slice(db):
    """STRIDE with an explicit period: the slice width is the QUERY
    resolution, not the table's (reference planner/local.go:144-150:
    strideSlice=resolution, resolution=stride)."""
    out = db.query("SELECT i FROM test_a GROUP BY _, period('2s'), STRIDE('4s')")
    rows = {r["_time"].timestamp(): r["i"] for r in out.collect()}
    # buckets E and E+1 both fall inside the first 2s slice of the 4s
    # stride (E % 4 == 0) and merge: i = 12 + 100
    assert rows == {float(E): 112.0}
