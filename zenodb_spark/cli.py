"""zeno-cli equivalent: run dialect SQL against a schema'd DB from the
command line (reference cmd/zeno-cli/zeno-cli.go — interactive SQL client
with -insert/-query/-timeout flags; web/HTTP layer is out of scope per
SURVEY §3.4).

Usage:
    python -m zenodb_spark.cli --schema schema.yaml [--workdir DIR] \
        [--insert STREAM=points.parquet ...] \
        [--query "SELECT …"] [--timeout SECONDS]
    python -m zenodb_spark.cli --addr HOST:PORT [--password PWD] \
        [--porcelain] --query "SELECT …"

With no --query, reads SQL statements from stdin (one per line; blank line
or EOF exits) — the REPL mode. Results print as Spark's show() table.

``--addr`` switches to REMOTE-CLIENT mode (the reference zeno-cli shape:
-addr/-password/-porcelain, cmd/zeno-cli/zeno-cli.go:39–46): the SQL runs
on a server started with ``rpc.serve_rpc`` and rows stream back over the
framed transport — no local SparkSession is created. ``--porcelain``
prints tab-separated rows with no header, for machine consumption.
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="zenodb-spark", description=__doc__)
    ap.add_argument("--schema", default=None, help="schema YAML file (table name → {sql, …})")
    ap.add_argument("--addr", default=None, metavar="HOST:PORT",
                    help="remote-client mode: run queries on an rpc.serve_rpc server")
    ap.add_argument("--password", default=None, help="remote-client auth token")
    ap.add_argument("--porcelain", action="store_true",
                    help="machine-readable output: tab-separated, no header")
    ap.add_argument("--workdir", default=None, help="persistent table store directory")
    ap.add_argument(
        "--insert",
        action="append",
        default=[],
        metavar="STREAM=PARQUET",
        help="ingest a parquet file of points into a stream (repeatable)",
    )
    ap.add_argument("--aliases", default=None, help="aliases props file (NAME = template)")
    ap.add_argument("--query", default=None, help="single SQL statement; omit for REPL")
    ap.add_argument("--timeout", type=float, default=60.0, help="per-query timeout seconds (reference CLI default 1m)")
    ap.add_argument("--rows", type=int, default=100, help="max rows to display")
    args = ap.parse_args(argv)

    if args.addr:
        return _remote_main(ap, args)
    if not args.schema:
        ap.error("--schema is required (or use --addr for remote-client mode)")

    from zenodb_spark.engine import DB
    from zenodb_spark.session import get_spark

    spark = get_spark("zenodb_spark_cli")
    if args.aliases:
        from zenodb_spark.sqlparser.parser import load_aliases

        with open(args.aliases) as f:
            load_aliases(f.read())
    db = DB(spark, workdir=args.workdir)
    with open(args.schema) as f:
        db.apply_schema_yaml(f.read())

    from zenodb_spark.catalog import normalize_points

    for spec in args.insert:
        stream, _, path = spec.partition("=")
        if not path:
            ap.error(f"--insert expects STREAM=PARQUET, got {spec!r}")
        db.insert(stream, normalize_points(spark.read.parquet(path)))
    for t in db.tables.values():
        if t._parts:
            t.compact()

    def run(sql: str) -> None:
        import threading

        if sql.strip().upper().startswith("EXPLAIN "):
            print(db.explain(sql))
            return
        # reference parity: queries are bounded by a deadline (zeno-cli -timeout)
        timer = threading.Timer(args.timeout, spark.sparkContext.cancelAllJobs)
        timer.start()
        try:
            db.query(sql).show(args.rows, truncate=False)
        finally:
            timer.cancel()

    if args.query is not None:
        run(args.query)
        return 0

    for line in sys.stdin:
        sql = line.strip()
        if not sql:
            break
        try:
            run(sql)
        except Exception as e:  # REPL keeps going on bad SQL
            print(f"error: {e}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())


def _remote_main(ap, args) -> int:
    from zenodb_spark.rpc import Client

    host, _, port = args.addr.rpartition(":")
    if not port.isdigit():
        ap.error(f"--addr expects HOST:PORT, got {args.addr!r}")
    client = Client(host or "127.0.0.1", int(port),
                    timeout=args.timeout, password=args.password)

    def run(sql: str) -> None:
        fields, rows = client.query(sql)
        if args.porcelain:
            for r in rows:
                print("\t".join("" if v is None else str(v) for v in r))
        else:
            print("\t".join(fields))
            n = 0
            for r in rows:
                print("\t".join("" if v is None else str(v) for v in r))
                n += 1
                if n >= args.rows:
                    break

    if args.query is not None:
        run(args.query)
        return 0
    for line in sys.stdin:
        sql = line.strip()
        if not sql:
            break
        try:
            run(sql)
        except Exception as e:
            print(f"error: {e}", file=sys.stderr)
    return 0
