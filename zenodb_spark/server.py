"""zeno server equivalent: ONE embedded DB serving the RPC transport and
the HTTP dashboard layer together (reference cmd/zeno/zeno.go +
server/server.go:628-660 — the standalone-server shape: -dbdir, -addr for
the binary protocol, -httpaddr for JSON-over-HTTP, -password, -vtime,
schema file watched and live re-applied).

Out-of-scope reference flags, with the survey's rationale: TLS material
(-pkfile/-certfile) and the GitHub-OAuth cookie flow need external
PKI/IdP (web.py's static-token check is the OAuth-unconfigured analog);
cluster leader/follower flags are delegated to Spark's own distribution
(SURVEY §2.12); WAL tuning knobs are owned by Structured Streaming
checkpoints (SURVEY §1.3).

Usage:
    python -m zenodb_spark.server --schema schema.yaml [--dbdir DIR]
        [--addr HOST:PORT] [--httpaddr HOST:PORT] [--password PWD]
        [--aliases props] [--vtime] [--cache-ttl S] [--itercoalesce S]
"""

from __future__ import annotations

import argparse
import signal
import sys
import threading

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from zenodb_spark import web
from zenodb_spark.engine import DB
from zenodb_spark.rpc import serve_rpc


class ServerHandle:
    """Running standalone server: ``.db``, ``.rpc_addr``, ``.http_addr``;
    ``.stop()`` shuts down both listeners and the schema watcher."""

    def __init__(self, db: DB, rpc_srv, web_srv, watcher=None):
        self.db = db
        self._rpc = rpc_srv
        self._web = web_srv
        self._watcher = watcher
        self.rpc_addr = rpc_srv.server_address
        self.http_addr = web_srv.server_address

    def stop(self) -> None:
        if self._watcher is not None:
            self._watcher.stop()
        self._rpc.shutdown()
        self._web.shutdown()


def _vtime_db(spark: SparkSession, workdir: str | None) -> DB:
    """DB on a virtual clock advanced by insert timestamps (reference
    server.go:632 -vtime): now() is the max timestamp seen across inserts,
    so retention/ASOF math follows the DATA's time axis — the reproducible
    mode for replaying historical streams. Costs one tiny max-aggregate
    per insert batch (only when --vtime is on)."""
    clock = {"t": 0.0}
    db = DB(spark, workdir=workdir, now=lambda: clock["t"])
    inner = db.insert

    def insert(stream: str, points: DataFrame, ts_col: str = "ts") -> None:
        dtype = dict(points.dtypes).get(ts_col)
        mx = points.agg(F.max(F.col(ts_col).cast("double"))).first()[0]
        if mx is not None:
            if dtype == "bigint":  # raw epoch-nanos input
                mx = mx / 1e9
            clock["t"] = max(clock["t"], float(mx))
        inner(stream, points, ts_col)

    db.insert = insert
    return db


def start(
    spark: SparkSession,
    schema_path: str | None = None,
    schema_yaml: str | None = None,
    dbdir: str | None = None,
    rpc_host: str = "127.0.0.1",
    rpc_port: int = 0,
    http_host: str = "127.0.0.1",
    http_port: int = 0,
    password: str | None = None,
    vtime: bool = False,
    aliases_path: str | None = None,
    cache_ttl: float = web.DEFAULT_CACHE_TTL,
    coalesce_window: float = web.DEFAULT_COALESCE_WINDOW,
    max_response_bytes: int = web.DEFAULT_MAX_RESPONSE_BYTES,
    watch_interval: float = 1.0,
) -> ServerHandle:
    """Bring up the standalone server: schema (watched when given as a
    path), then the RPC listener and the HTTP layer sharing the one DB —
    an insert over either transport is immediately queryable over both."""
    if aliases_path:
        from zenodb_spark.sqlparser.parser import load_aliases

        with open(aliases_path) as f:
            load_aliases(f.read())
    db = _vtime_db(spark, dbdir) if vtime else DB(spark, workdir=dbdir)
    watcher = None
    if schema_path:
        watcher = db.watch_schema(schema_path, interval=watch_interval)
    elif schema_yaml:
        db.apply_schema_yaml(schema_yaml)
    else:
        raise ValueError("server.start needs schema_path or schema_yaml")
    rpc_srv = serve_rpc(db, rpc_host, rpc_port, password=password)
    web_srv = web.serve(
        db,
        http_host,
        http_port,
        cache_ttl=cache_ttl,
        coalesce_window=coalesce_window,
        max_response_bytes=max_response_bytes,
        password=password,
    )
    return ServerHandle(db, rpc_srv, web_srv, watcher)


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="zenodb-spark-server", description=__doc__)
    ap.add_argument("--schema", required=True, help="schema YAML file (watched for changes)")
    ap.add_argument("--aliases", default=None, help="aliases props file (NAME = template)")
    ap.add_argument("--dbdir", default="zenodata",
                    help="directory for persisted table stores (reference default ./zenodata)")
    ap.add_argument("--addr", default="127.0.0.1:17712", metavar="HOST:PORT",
                    help="RPC listen address (reference default localhost:17712)")
    ap.add_argument("--httpaddr", default="127.0.0.1:17713", metavar="HOST:PORT",
                    help="HTTP listen address (reference default localhost:17713)")
    ap.add_argument("--password", default=None, help="static auth token for both transports")
    ap.add_argument("--vtime", action="store_true",
                    help="virtual time: clock advances with inserted timestamps")
    ap.add_argument("--cache-ttl", type=float, default=web.DEFAULT_CACHE_TTL,
                    help="web result-cache TTL seconds")
    ap.add_argument("--itercoalesce", type=float, default=web.DEFAULT_COALESCE_WINDOW,
                    help="window for coalescing concurrent identical/overlapping queries")
    ap.add_argument("--maxresponsebytes", type=int, default=web.DEFAULT_MAX_RESPONSE_BYTES,
                    help="response-size guard for query results")
    args = ap.parse_args(argv)

    rpc_host, _, rpc_port = args.addr.rpartition(":")
    http_host, _, http_port = args.httpaddr.rpartition(":")

    from zenodb_spark.session import get_spark

    spark = get_spark("zenodb_spark_server")
    handle = start(
        spark,
        schema_path=args.schema,
        dbdir=args.dbdir,
        rpc_host=rpc_host or "127.0.0.1",
        rpc_port=int(rpc_port),
        http_host=http_host or "127.0.0.1",
        http_port=int(http_port),
        password=args.password,
        vtime=args.vtime,
        aliases_path=args.aliases,
        cache_ttl=args.cache_ttl,
        coalesce_window=args.itercoalesce,
        max_response_bytes=args.maxresponsebytes,
    )
    print(f"rpc listening on {handle.rpc_addr[0]}:{handle.rpc_addr[1]}")
    print(f"http listening on {handle.http_addr[0]}:{handle.http_addr[1]}")

    done = threading.Event()
    for sig in (signal.SIGINT, signal.SIGTERM):
        signal.signal(sig, lambda *_: done.set())
    done.wait()
    handle.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
