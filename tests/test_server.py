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


def test_concurrent_inserts_and_queries(server):
    """Thread hammer: concurrent RPC inserters + HTTP and RPC readers on
    the one shared DB must neither error nor lose points (the reference
    serves both transports from one zenodb.DB under its own locks; here
    the DataFrame parts list is driver-side state exercised from many
    threads)."""
    import threading

    handle, _ = server
    host, port = handle.rpc_addr
    hh, hp = handle.http_addr
    base_ts = E + 1000
    n_threads, per_thread = 4, 10
    errors: list[Exception] = []

    def insert_worker(tid: int):
        try:
            client = Client(host, port)
            ins = client.new_inserter("svclicks")
            for i in range(per_thread):
                ins.insert(
                    base_ts + tid * per_thread + i,
                    {"site": f"hammer{tid}"},
                    {"n": 1.0},
                )
            rep = ins.close()
            assert rep["received"] == per_thread
        except Exception as e:  # pragma: no cover - surfaced below
            errors.append(e)

    def query_worker():
        try:
            for _ in range(5):
                _get(
                    f"http://{hh}:{hp}/run?"
                    + urllib.parse.quote("SELECT n FROM svhits GROUP BY site")
                )
        except Exception as e:  # pragma: no cover
            errors.append(e)

    threads = [
        threading.Thread(target=insert_worker, args=(t,)) for t in range(n_threads)
    ] + [threading.Thread(target=query_worker) for _ in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(120)
    assert not errors, errors

    client = Client(host, port)
    fields, rows = client.query(
        "SELECT n FROM svhits WHERE site LIKE 'hammer%' GROUP BY site"
    )
    got = {r[fields.index("site")]: r[fields.index("n")] for r in rows}
    assert got == {f"hammer{t}": float(per_thread) for t in range(n_threads)}
