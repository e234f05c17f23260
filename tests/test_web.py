"""HTTP insert/query endpoint tests (reference web/insert.go + web/query.go:
POST JSON points to a stream, query them back over HTTP)."""

from __future__ import annotations

import datetime as dt
import json
import urllib.request

import pytest

from zenodb_spark.engine import DB
from zenodb_spark.web import serve

EPOCH = dt.datetime(2015, 1, 1, tzinfo=dt.timezone.utc)
E = EPOCH.timestamp()


@pytest.fixture(scope="module")
def server(spark):
    db = DB(spark, now=E + 100)
    db.apply_schema(
        {
            "hits": {
                "retentionperiod": "1h",
                "sql": "SELECT n FROM clicks GROUP BY site, period('10s')",
            }
        }
    )
    srv = serve(db)
    yield f"http://{srv.server_address[0]}:{srv.server_address[1]}"
    srv.shutdown()


def _post(url: str, body: bytes, ctype: str = "application/json"):
    req = urllib.request.Request(url, data=body, headers={"Content-Type": ctype})
    try:
        with urllib.request.urlopen(req) as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_insert_then_query(server):
    points = "".join(
        json.dumps({"ts": E + i, "dims": {"site": "a"}, "vals": {"n": 2.0}})
        for i in range(3)
    )
    status, body = _post(f"{server}/insert/clicks", points.encode())
    assert status == 201 and body["inserted"] == 3

    with urllib.request.urlopen(
        f"{server}/query?sql=" + urllib.parse.quote("SELECT n FROM hits GROUP BY site, period('100s')")
    ) as resp:
        out = json.loads(resp.read())
    assert out["columns"] == ["_time", "site", "n"]
    assert len(out["rows"]) == 1
    assert out["rows"][0][1] == "a" and out["rows"][0][2] == 6.0


def test_insert_validation(server):
    bad = json.dumps({"ts": E, "vals": {"n": 1.0}})  # no dims
    status, body = _post(f"{server}/insert/clicks", bad.encode())
    assert status == 400 and "dim" in body["error"]

    status, body = _post(f"{server}/insert/clicks", b"{}", ctype="text/plain")
    assert status == 415

    status, body = _post(f"{server}/insert/clicks", b"{not json")
    assert status == 400


def test_query_error_and_post_body(server):
    status, body = _post(f"{server}/query", b"SELECT n FROM nope GROUP BY site")
    assert status == 400 and "nope" in body["error"]

    status, body = _post(
        f"{server}/query", b"SELECT n FROM hits GROUP BY _, period('100s')"
    )
    assert status == 200
    assert body["rows"][0][-1] == 6.0
