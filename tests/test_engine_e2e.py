"""End-to-end engine goldens, modeled on the reference's README quickstart
transcript (README.md:96–399) and zenodb_test.go corpus: schema → scripted
inserts → SQL queries → exact row assertions (float tolerance 0.01, like
testsupport/expectedresult.go:81)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Row

from zenodb_spark.engine import DB

EPOCH = dt.datetime(2015, 1, 1, 2, 3, 4, tzinfo=dt.timezone.utc)
E = EPOCH.timestamp()


def ts(off: float) -> dt.datetime:
    return dt.datetime.fromtimestamp(E + off, dt.timezone.utc)


SCHEMA = {
    "combined": {
        "retentionperiod": "1h",
        "sql": "SELECT requests, AVG(load_avg) AS load_avg FROM inbound GROUP BY *, period('5m')",
    },
    "base": {
        "virtual": True,
        "sql": "SELECT requests, AVG(load_avg) AS load_avg FROM inbound GROUP BY *, period('5m')",
    },
    "derived": {
        "view": True,
        "retentionperiod": "1h",
        "sql": "SELECT requests + load_avg AS rpla FROM base",
    },
}


@pytest.fixture(scope="module")
def db(spark):
    db = DB(spark, now=E + 600)
    db.apply_schema(SCHEMA)
    pts = [
        Row(ts=ts(0), server="56.234.163.23", path="/index.html", status=200, requests=56.0, load_avg=None),
        Row(ts=ts(1), server="56.234.163.23", path="/login", status=500, requests=4.0, load_avg=None),
        Row(ts=ts(2), server="56.234.163.23", path=None, status=None, requests=None, load_avg=0.32),
        Row(ts=ts(3), server="200.23.94.5", path="/index.html", status=200, requests=12.0, load_avg=None),
        Row(ts=ts(4), server="200.23.94.5", path=None, status=None, requests=None, load_avg=0.11),
    ]
    db.insert("inbound", spark.createDataFrame(pts))
    return db


def rowmap(df, *keys):
    return {tuple(r[k] for k in keys): r for r in df.collect()}


def test_quickstart_basic(db):
    out = db.query(
        "SELECT _points, requests, load_avg FROM combined GROUP BY * ORDER BY requests DESC"
    )
    rows = rowmap(out, "server", "path", "status")
    assert len(rows) == 5
    r = rows[("56.234.163.23", "/index.html", 200)]
    assert r["_points"] == 1.0 and r["requests"] == 56.0
    r2 = rows[("56.234.163.23", None, None)]
    assert abs(r2["load_avg"] - 0.32) < 0.01
    # requests of load-only rows reads 0 (SUM of nothing), load_avg of
    # request rows is null-ish (AVG of nothing)
    assert rows[("56.234.163.23", "/login", 500)]["requests"] == 4.0


def test_sum_doubles_avg_stays(db, spark):
    # re-insert the same load_avg point: SUM doubles, AVG stays (README:160–217)
    db2 = DB(spark, now=E + 600)
    db2.apply_schema(SCHEMA)
    pts = [
        Row(ts=ts(0), server="a", path="/x", status=200, requests=10.0, load_avg=0.5),
        Row(ts=ts(1), server="a", path="/x", status=200, requests=10.0, load_avg=0.5),
    ]
    db2.insert("inbound", spark.createDataFrame(pts))
    r = db2.query("SELECT requests, load_avg FROM combined GROUP BY server").collect()[0]
    assert r["requests"] == 20.0
    assert abs(r["load_avg"] - 0.5) < 0.01


def test_group_by_dim_subset(db):
    out = db.query("SELECT requests FROM combined GROUP BY server ORDER BY requests DESC")
    rows = out.collect()
    assert [r["server"] for r in rows] == ["56.234.163.23", "200.23.94.5"]
    assert [r["requests"] for r in rows] == [60.0, 12.0]


def test_if_conditional_error_rate(db):
    out = db.query(
        "SELECT IF(status <> 200, requests) AS errors, requests AS total "
        "FROM combined GROUP BY server"
    )
    rows = rowmap(out, "server")
    assert rows[("56.234.163.23",)]["errors"] == 4.0
    assert rows[("56.234.163.23",)]["total"] == 60.0
    assert rows[("200.23.94.5",)]["errors"] == 0.0


def test_crosstab(db):
    out = db.query("SELECT requests FROM combined GROUP BY server, CROSSTAB(path)")
    cols = set(out.columns)
    assert "/index.html_requests" in cols and "/login_requests" in cols
    rows = rowmap(out, "server")
    assert rows[("56.234.163.23",)]["/index.html_requests"] == 56.0
    assert rows[("56.234.163.23",)]["/login_requests"] == 4.0


def test_crosstabt_totals(db):
    out = db.query("SELECT requests FROM combined GROUP BY server, CROSSTABT(path)")
    rows = rowmap(out, "server")
    assert rows[("56.234.163.23",)]["total_requests"] == 60.0


def test_having(db):
    out = db.query(
        "SELECT requests FROM combined GROUP BY server HAVING requests > 20"
    )
    rows = out.collect()
    assert len(rows) == 1 and rows[0]["server"] == "56.234.163.23"


def test_having_on_unselected_field(db):
    # HAVING references load_avg which is not selected (reference
    # zenodb_test.go:514–536 proves this works via the synthetic _having)
    out = db.query(
        "SELECT requests FROM combined GROUP BY server HAVING AVG(load_avg) > 0.2"
    )
    rows = out.collect()
    assert len(rows) == 1 and rows[0]["server"] == "56.234.163.23"
    assert "load_avg" not in out.columns and "_having" not in out.columns


def test_order_limit_offset(db):
    out = db.query(
        "SELECT requests FROM combined GROUP BY server ORDER BY requests DESC LIMIT 1"
    )
    assert [r["server"] for r in out.collect()] == ["56.234.163.23"]
    out2 = db.query(
        "SELECT requests FROM combined GROUP BY server ORDER BY requests DESC LIMIT 1, 1"
    )
    assert [r["server"] for r in out2.collect()] == ["200.23.94.5"]


def test_select_star(db):
    out = db.query("SELECT * FROM combined GROUP BY server ORDER BY requests DESC")
    assert {"_points", "requests", "load_avg", "server", "_time"} <= set(out.columns)


def test_view_derived(db):
    out = db.query("SELECT rpla FROM derived GROUP BY server ORDER BY rpla DESC")
    rows = rowmap(out, "server")
    assert abs(rows[("56.234.163.23",)]["rpla"] - 60.32) < 0.01


def test_agg_mismatch_rejected(db):
    with pytest.raises(ValueError, match="does not match any stored field"):
        db.query("SELECT SUM(load_avg) AS x FROM combined GROUP BY server").collect()


def test_virtual_not_queryable(db):
    with pytest.raises(ValueError, match="virtual"):
        db.query("SELECT requests FROM base")


def test_asof_until(db):
    out = db.query(
        "SELECT requests FROM combined ASOF '2015-01-01T00:00:00Z' UNTIL '2015-01-01T12:00:00Z' GROUP BY server"
    )
    assert out.count() == 2
    out2 = db.query("SELECT requests FROM combined ASOF '-1m' GROUP BY server")
    # now = E+600, asof = E+540 > all buckets (E rounded to 5m) → empty
    assert out2.count() == 0


def test_from_subquery(db):
    out = db.query(
        "SELECT requests FROM (SELECT requests FROM combined GROUP BY server, period('5m')) "
        "GROUP BY _, period('10m')"
    )
    rows = out.collect()
    assert len(rows) == 1 and rows[0]["requests"] == 72.0


def test_in_subquery(db):
    out = db.query(
        "SELECT requests FROM combined "
        "WHERE server IN (SELECT server FROM combined GROUP BY server HAVING requests > 20) "
        "GROUP BY server"
    )
    rows = out.collect()
    assert len(rows) == 1 and rows[0]["server"] == "56.234.163.23"


def test_view_finer_resolution(db, spark):
    """A view can store FINER granularity than its parent because it
    re-consumes the parent's input stream, not the parent's stored buckets
    (reference table.go:194-250, README.md:516-518)."""
    db2 = DB(spark, now=E + 600)
    db2.apply_schema(
        {
            "coarse": {
                "sql": "SELECT requests FROM inbound GROUP BY server, period('5m')",
            },
            "fine": {
                "view": True,
                "sql": "SELECT requests FROM coarse GROUP BY server, period('1s')",
            },
        }
    )
    db2.insert(
        "inbound",
        spark.createDataFrame(
            [
                Row(ts=ts(0), server="a", requests=3.0),
                Row(ts=ts(1), server="a", requests=5.0),
            ]
        ),
    )
    coarse = db2.query("SELECT requests FROM coarse GROUP BY server").collect()
    assert coarse[0]["requests"] == 8.0
    fine = sorted(
        (r["_time"].timestamp(), r["requests"])
        for r in db2.query("SELECT requests FROM fine GROUP BY server, period('1s')").collect()
    )
    assert fine == [(E, 3.0), (E + 1, 5.0)]
