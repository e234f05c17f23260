"""Standalone-server e2e (reference cmd/zeno/zeno.go + server/server.go):
one DB behind BOTH transports — insert over RPC, read the same rows over
HTTP and RPC; virtual time follows inserted timestamps; the schema file is
watched and live re-applied."""

from __future__ import annotations

import datetime as dt
import gzip
import json
import time
import urllib.parse
import urllib.request

import pytest

from zenodb_spark.rpc import Client
from zenodb_spark.server import start

E = dt.datetime(2015, 1, 1, tzinfo=dt.timezone.utc).timestamp()

SCHEMA = """
svhits:
  retentionperiod: 1h
  sql: SELECT n FROM svclicks GROUP BY site, period('10s')
"""

SCHEMA2 = SCHEMA + """
svtotals:
  retentionperiod: 1h
  sql: SELECT n FROM svclicks GROUP BY period('1h')
"""


def _get(url: str):
    with urllib.request.urlopen(url) as resp:
        raw = resp.read()
        if resp.headers.get("Content-Encoding") == "gzip":
            raw = gzip.decompress(raw)
        return resp.status, raw


@pytest.fixture(scope="module")
def server(spark, tmp_path_factory):
    schema_file = tmp_path_factory.mktemp("srv") / "schema.yaml"
    schema_file.write_text(SCHEMA)
    handle = start(spark, schema_path=str(schema_file), vtime=True, watch_interval=0.2)
    yield handle, schema_file
    handle.stop()


def test_insert_rpc_read_both_transports(server):
    handle, _ = server
    host, port = handle.rpc_addr
    client = Client(host, port)
    ins = client.new_inserter("svclicks")
    for i in range(6):
        ins.insert(E + i, {"site": f"s{i % 2}"}, {"n": 1.0 + i})
    report = ins.close()
    assert report["received"] == 6

    # vtime: the DB clock followed the inserted timestamps
    assert handle.db.now() == pytest.approx(E + 5)

    sql = "SELECT n FROM svhits GROUP BY site"
    fields, rows = client.query(sql)
    by_site = {r[fields.index("site")]: r[fields.index("n")] for r in rows}
    assert by_site == {"s0": 1 + 3 + 5, "s1": 2 + 4 + 6}

    hh, hp = handle.http_addr
    status, raw = _get(f"http://{hh}:{hp}/run?" + urllib.parse.quote(sql))
    assert status == 200
    payload = json.loads(raw)
    assert payload["Dims"] == ["site"]
    assert payload["Fields"] == ["n"]
    hrows = {r["Key"]["site"]: r["Vals"][0] for r in payload["Rows"]}
    assert hrows == by_site


def test_schema_file_watched_and_reapplied(server):
    handle, schema_file = server
    assert "svtotals" not in handle.db.tables
    schema_file.write_text(SCHEMA2)
    deadline = time.time() + 5
    while time.time() < deadline and "svtotals" not in handle.db.tables:
        time.sleep(0.1)
    assert "svtotals" in handle.db.tables
