"""HTTP insert + query endpoints — the Spark analog of the reference's web
layer (web/insert.go:27–72, web/query.go:168–215) and rpc query surface
(rpc/rpc.go:26–37), on the Python stdlib only.

- ``POST /insert/{stream}``: body is a stream of JSON point objects
  ``{"dims": {...}, "vals": {...}, "ts": <rfc3339|epoch-seconds>?}``
  (concatenated or newline-delimited, exactly the reference's decoder loop).
  Points must carry ≥1 dim and ≥1 val; a missing ts defaults to now.
  Points land via ``DB.insert`` on the named stream, so every table
  subscribed to that stream folds them in.
- ``GET/POST /query?sql=...`` (or a raw-SQL POST body): runs the zenodb
  dialect through ``DB.query`` and returns ``{"columns": [...], "rows":
  [...]}`` with timestamps in RFC3339.

Same-table query coalescing (web/query.go:168–215) is intentionally NOT
replicated: concurrent Spark actions already share the scan via in-JVM
caching, and the Spark scheduler interleaves jobs — a 5-second batching
window would only add latency. Documented deviation.
"""

from __future__ import annotations

import datetime as dt
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

from zenodb_spark.engine import DB


def _parse_ts(v) -> dt.datetime:
    if v is None:
        return dt.datetime.now(dt.timezone.utc)
    if isinstance(v, (int, float)):
        return dt.datetime.fromtimestamp(float(v), dt.timezone.utc)
    d = dt.datetime.fromisoformat(str(v).replace("Z", "+00:00"))
    if d.tzinfo is None:
        d = d.replace(tzinfo=dt.timezone.utc)
    return d


def _json_value(v):
    if isinstance(v, dt.datetime):
        if v.tzinfo is None:
            v = v.replace(tzinfo=dt.timezone.utc)
        return v.isoformat()
    return v


class _Handler(BaseHTTPRequestHandler):
    db: DB  # set on the subclass by serve()

    def log_message(self, fmt, *args):  # quiet by default
        pass

    def _reply(self, code: int, payload: dict | str) -> None:
        body = (
            json.dumps(payload) if isinstance(payload, dict) else payload
        ).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    # -- insert (reference web/insert.go:27–72) -----------------------------
    def _handle_insert(self, stream: str) -> None:
        if self.headers.get("Content-Type", "").split(";")[0] != "application/json":
            self._reply(415, {"error": "Content-Type must be application/json"})
            return
        length = int(self.headers.get("Content-Length", "0"))
        raw = self.rfile.read(length).decode()
        decoder = json.JSONDecoder()
        rows, pos = [], 0
        while True:
            while pos < len(raw) and raw[pos].isspace():
                pos += 1
            if pos >= len(raw):
                break
            try:
                point, pos = decoder.raw_decode(raw, pos)
            except json.JSONDecodeError as e:
                self._reply(400, {"error": f"Error decoding JSON: {e}"})
                return
            dims = point.get("dims") or {}
            vals = point.get("vals") or {}
            if not dims:
                self._reply(400, {"error": "Need at least one dim"})
                return
            if not vals:
                self._reply(400, {"error": "Need at least one val"})
                return
            rows.append({"ts": _parse_ts(point.get("ts")), **dims, **vals})
        if rows:
            self.db.insert_rows(stream, rows)
        self._reply(201, {"inserted": len(rows)})

    # -- query (reference web/query.go, rpc/rpc.go:26–37) -------------------
    def _handle_query(self, sql: str) -> None:
        if not sql:
            self._reply(400, {"error": "missing sql"})
            return
        try:
            df = self.db.query(sql)
            cols = df.columns
            rows = [[_json_value(r[c]) for c in cols] for r in df.collect()]
        except Exception as e:
            self._reply(400, {"error": str(e)})
            return
        self._reply(200, {"columns": cols, "rows": rows})

    def do_POST(self) -> None:
        url = urlparse(self.path)
        parts = [p for p in url.path.split("/") if p]
        if len(parts) == 2 and parts[0] == "insert":
            self._handle_insert(parts[1])
        elif parts == ["query"]:
            qs = parse_qs(url.query)
            sql = qs.get("sql", [None])[0]
            if sql is None:
                length = int(self.headers.get("Content-Length", "0"))
                sql = self.rfile.read(length).decode().strip()
            self._handle_query(sql)
        else:
            self._reply(404, {"error": f"no route {url.path}"})

    def do_GET(self) -> None:
        url = urlparse(self.path)
        if url.path.rstrip("/") == "/query":
            qs = parse_qs(url.query)
            self._handle_query(qs.get("sql", [""])[0])
        else:
            self._reply(404, {"error": f"no route {url.path}"})


def serve(db: DB, host: str = "127.0.0.1", port: int = 0):
    """Start the HTTP layer on a daemon thread; returns the server (its
    ``.server_address`` carries the bound port; call ``.shutdown()`` to
    stop)."""
    handler = type("BoundHandler", (_Handler,), {"db": db})
    srv = ThreadingHTTPServer((host, port), handler)
    threading.Thread(target=srv.serve_forever, name="zenodb-web", daemon=True).start()
    return srv
