"""Full oracle gate at sf1.0 (round-5 verdict item 3).

Runs the dual-engine (Spark vs DuckDB) comparison from driver_check at an
sf1.0 directory synthesized by tools/gen_sf.py. The dual-SF default gate
stops at sf0.1; this extends it a third decade — the round-3/4 experience
was that each new scale catches bugs the smaller ones hide (HLL drift,
sampled-boundary and rounding disagreements all appeared only at sf0.1).

Budget control: some ORACLES are deliberately brute-force quadratic
(q32/q204-style all-pairs proofs that the blocked Spark plan is lossless).
At 50k docs / 20k embeddings those DuckDB proofs are O(10^8..10^9) pairs —
hours, not minutes. Rather than silently hang, every query gets a wall
budget per engine; a timer thread calls `con.interrupt()` (DuckDB) or
`sparkContext.cancelJobGroup` (Spark) and the query is recorded as
`skipped_budget`, listed explicitly in the artifact (the verdict's
"record which" requirement).

Usage:
  python tools/sf1_gate.py [--sf-dir D] [--out F] [--budget SEC] [names...]

With no names: all z* entries plus the 30 slowest q* from the most recent
sf1 bench JSON (--bench), i.e. exactly the time-boxed set the round-4
verdict prescribes.
"""

from __future__ import annotations

import argparse
import json
import math
import threading
import time
import traceback
from pathlib import Path
import sys

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb
from pyspark.sql import SparkSession

from driver_check import _rows  # same canonicalization as the driver gate


def _load_bench_slowest(bench_path: str, n: int) -> list[str]:
    d = json.load(open(bench_path))
    if "parsed" in d:
        d = d["parsed"]
    qs = {k: v for k, v in d["queries"].items() if k.startswith("q")}
    return [k for k, _ in sorted(qs.items(), key=lambda kv: -kv[1])[:n]]


class _Budget:
    """Arm a watchdog for one engine call; disarm before comparing.

    The cancel RE-FIRES every few seconds once the budget lapses: a
    one-shot cancelJobGroup only kills jobs ACTIVE at that instant, so a
    multi-job query (planner probes, checkpoint chains) whose cancel
    lands between jobs would sail on — the sf10 q24 run overshot its
    budget exactly this way before the re-fire."""

    REFIRE_SEC = 10.0

    def __init__(self, seconds: float, cancel):
        self.seconds, self.cancel = seconds, cancel
        self.fired = False
        self._t = None
        self._stop = threading.Event()

    def __enter__(self):
        def fire():
            self.fired = True
            while not self._stop.is_set():
                try:
                    self.cancel()
                except Exception:
                    pass
                self._stop.wait(self.REFIRE_SEC)

        self._t = threading.Timer(self.seconds, fire)
        self._t.daemon = True
        self._t.start()
        return self

    def __exit__(self, *exc):
        self._stop.set()
        self._t.cancel()
        return False


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/repo/.localdata/sf1.0")
    ap.add_argument("--out", default="/root/repo/CORRECTNESS_sf1_r05.json")
    ap.add_argument("--bench", default="/root/repo/BENCH_sf1_r04.json")
    ap.add_argument("--budget", type=float, default=240.0)
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    from zenodb_spark import queries as Q

    if args.names:
        names = [n for n in sorted(Q.QUERIES) if any(p in n for p in args.names)]
    else:
        zs = [n for n in sorted(Q.QUERIES) if n.startswith("z")]
        qs = _load_bench_slowest(args.bench, args.top)
        names = zs + [q for q in qs if q in Q.QUERIES]

    # Bare confs like the driver gate, EXCEPT the heap: the driver's own
    # gate stops at sf0.01 where 1g suffices; at sf1.0 a default-heap JVM
    # dies in the first wide shuffle, which would test the sandbox, not the
    # engine. 64g driver memory on local[16] mirrors a plausible executor
    # sizing (4g/thread).
    import os

    spark = (
        SparkSession.builder.appName("sf1_gate")
        .master("local[16]")
        # sf10 runs want 96g (the bench's SPARK_DRIVER_MEM convention)
        .config("spark.driver.memory", os.environ.get("SPARK_GATE_MEM", "64g"))
        .getOrCreate()
    )
    sc = spark.sparkContext
    sc.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{args.sf_dir}/{t}.parquet'")

    results: dict[str, dict] = {}
    for name in names:
        rec: dict = {"spark_sec": None, "oracle_sec": None, "status": None}
        results[name] = rec
        t0 = time.time()
        sc.setJobGroup(name, name, interruptOnCancel=True)
        try:
            with _Budget(args.budget, lambda: sc.cancelJobGroup(name)) as b:
                sdf = Q.QUERIES[name](spark, args.sf_dir)
                scols = sdf.columns
                srows = [[r[c] for c in scols] for r in sdf.collect()]
            if b.fired:
                rec["status"] = "skipped_budget_spark"
                print(f"  {name}: SKIP spark>{args.budget}s")
                continue
        except Exception:
            if b.fired:
                rec["status"] = "skipped_budget_spark"
                print(f"  {name}: SKIP spark>{args.budget}s (cancelled)")
            else:
                rec["status"] = "error_spark"
                print(f"  {name}: SPARK ERROR")
                traceback.print_exc(limit=3)
            continue
        rec["spark_sec"] = round(time.time() - t0, 1)
        rec["spark_rows"] = len(srows)

        if name not in Q.ORACLE:
            rec["status"] = "rows_only"
            print(f"  {name}: rows={len(srows)} (no oracle) {rec['spark_sec']}s")
            continue

        t1 = time.time()
        try:
            with _Budget(args.budget, con.interrupt) as b:
                res = con.sql(Q.ORACLE[name])
                dcols, drows = res.columns, res.fetchall()
            if b.fired:
                rec["status"] = "skipped_budget_oracle"
                print(f"  {name}: SKIP oracle>{args.budget}s")
                continue
        except Exception as e:
            if b.fired or "INTERRUPT" in str(e).upper():
                rec["status"] = "skipped_budget_oracle"
                print(f"  {name}: SKIP oracle>{args.budget}s (interrupted)")
            else:
                rec["status"] = "error_oracle"
                print(f"  {name}: ORACLE ERROR {e}")
            continue
        rec["oracle_sec"] = round(time.time() - t1, 1)
        rec["oracle_rows"] = len(drows)

        ok_schema = sorted(scols) == sorted(dcols)
        ok_rows = len(srows) == len(drows)
        mism = []
        if ok_rows:
            s, d = _rows(scols, srows), _rows(dcols, drows)
            mism = [(a, b) for a, b in zip(s, d) if a != b]
        ok = ok_schema and ok_rows and not mism
        rec["status"] = "ok" if ok else "mismatch"
        print(
            f"  {name}: {'OK' if ok else 'MISMATCH'} spark={len(srows)}"
            f"/{rec['spark_sec']}s oracle={len(drows)}/{rec['oracle_sec']}s"
        )
        if not ok:
            if not ok_schema:
                print(f"    cols: {sorted(scols)} vs {sorted(dcols)}")
            for a, b in mism[:3]:
                print(f"    spark={a}\n    duck ={b}")

    summary = {
        "sf_dir": args.sf_dir,
        "budget_sec": args.budget,
        "n": len(names),
        "ok": sorted(n for n, r in results.items() if r["status"] == "ok"),
        "rows_only": sorted(n for n, r in results.items() if r["status"] == "rows_only"),
        "skipped_budget": sorted(
            n for n, r in results.items() if r["status"].startswith("skipped_budget")
        ),
        "failed": sorted(
            n
            for n, r in results.items()
            if r["status"] in ("mismatch", "error_spark", "error_oracle")
        ),
        "detail": results,
    }
    Path(args.out).write_text(json.dumps(summary, indent=1))
    print(
        f"\n{len(summary['ok'])} ok, {len(summary['rows_only'])} rows-only, "
        f"{len(summary['skipped_budget'])} over-budget, "
        f"{len(summary['failed'])} FAILED -> {args.out}"
    )
    return 1 if summary["failed"] else 0


if __name__ == "__main__":
    raise SystemExit(main())
