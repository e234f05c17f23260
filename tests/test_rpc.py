"""RPC transport e2e (reference rpc/rpc.go:26–80, rpc_client.go): streaming
insert via the binary protocol, then read the same rows back via SQL over
both the RPC query stream and the embedded API."""

from __future__ import annotations

import datetime as dt

import pytest

from zenodb_spark.engine import DB
from zenodb_spark.rpc import Client, serve_rpc

E = dt.datetime(2015, 1, 1, tzinfo=dt.timezone.utc).timestamp()


@pytest.fixture(scope="module")
def rpc(spark):
    db = DB(spark, now=E + 100)
    db.apply_schema(
        {
            "rhits": {
                "retentionperiod": "1h",
                "sql": "SELECT n FROM rclicks GROUP BY site, period('10s')",
            }
        }
    )
    srv = serve_rpc(db)
    host, port = srv.server_address
    yield Client(host, port), db
    srv.shutdown()


def test_streaming_insert_then_query_roundtrip(rpc):
    client, db = rpc
    ins = client.new_inserter("rclicks")
    for i in range(6):
        ins.insert(E + i, {"site": f"s{i % 2}"}, {"n": 1.0 + i})
    report = ins.close()
    assert report["received"] == 6
    assert report["succeeded"] == 6
    assert report["errors"] == {}

    # same rows via the RPC query stream…
    fields, rows = client.query("SELECT n FROM rhits GROUP BY site, period('100s')")
    got = sorted((r[fields.index("site")], r[fields.index("n")]) for r in rows)
    # sites s0: n=1+3+5=9, s1: n=2+4+6=12
    assert got == [("s0", 9.0), ("s1", 12.0)]

    # …and via the embedded API (one source of truth)
    emb = sorted(
        (r["site"], r["n"])
        for r in db.query("SELECT n FROM rhits GROUP BY site, period('100s')").collect()
    )
    assert emb == got


def test_insert_validation_per_point(rpc):
    client, db = rpc
    ins = client.new_inserter("rclicks")
    ins.insert(E + 50, {}, {"n": 1.0})  # no dims → per-point error
    ins.insert(E + 51, {"site": "ok"}, {})  # no vals → per-point error
    ins.insert(E + 52, {"site": "ok"}, {"n": 5.0})  # fine
    report = ins.close()
    assert report["received"] == 3
    assert report["succeeded"] == 1
    assert set(report["errors"]) == {"0", "1"}


def test_empty_inserter_close(rpc):
    client, db = rpc
    report = client.new_inserter("rclicks").close()
    assert report == {"received": 0, "succeeded": 0, "errors": {}}


def test_query_error_propagates(rpc):
    client, db = rpc
    with pytest.raises(RuntimeError, match="nosuch"):
        client.query("SELECT n FROM nosuch GROUP BY site")


def test_missing_stream_name_rejected(rpc):
    import socket

    from zenodb_spark.rpc import _recv, _send

    client, db = rpc
    sock = socket.create_connection(client._addr, timeout=10)
    _send(sock, {"type": "insert", "ts": E, "dims": {"site": "x"}, "vals": {"n": 1.0}})
    _send(sock, {"end_of_inserts": True})
    report = _recv(sock)
    assert report["succeeded"] == 0 and "stream" in str(report["errors"])
    sock.close()


def test_password_auth(spark):
    from zenodb_spark.rpc import Client, serve_rpc

    db = DB(spark, now=E + 100)
    db.apply_schema(
        {
            "ahits": {
                "retentionperiod": "1h",
                "sql": "SELECT n FROM aclicks GROUP BY site, period('10s')",
            }
        }
    )
    srv = serve_rpc(db, password="sekrit")
    host, port = srv.server_address
    try:
        # wrong/absent password → rejected on both surfaces
        bad = Client(host, port)
        with pytest.raises(RuntimeError, match="not authorized"):
            bad.query("SELECT n FROM ahits GROUP BY site")
        rep = bad.new_inserter("aclicks").close()
        assert "not authorized" in str(rep.get("error", rep))

        # right password → full roundtrip
        good = Client(host, port, password="sekrit")
        ins = good.new_inserter("aclicks")
        ins.insert(E + 1, {"site": "a"}, {"n": 3.0})
        assert ins.close()["succeeded"] == 1
        fields, rows = good.query("SELECT n FROM ahits GROUP BY site, period('100s')")
        assert [r[fields.index("n")] for r in rows] == [3.0]
    finally:
        srv.shutdown()


def test_cli_remote_mode(rpc, capsys):
    """zeno-cli shape: --addr routes the query over the framed transport,
    no local SparkSession; --porcelain drops the header."""
    client, db = rpc
    host, port = client._addr
    from zenodb_spark.cli import main

    # self-sufficient: seed via the transport (test selection must not
    # depend on the insert test having run first)
    ins = client.new_inserter("rclicks")
    ins.insert(E + 50, {"site": "cli"}, {"n": 7.0})
    ins.close()
    sql = "SELECT n FROM rhits GROUP BY site ORDER BY site"
    rc = main(["--addr", f"{host}:{port}", "--query", sql])
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert out[0].split("\t")[-1] == "n"  # header row present
    assert len(out) > 1
    rc = main(["--addr", f"{host}:{port}", "--porcelain", "--query", sql])
    assert rc == 0
    out2 = capsys.readouterr().out.strip().splitlines()
    assert len(out2) == len(out) - 1  # no header
