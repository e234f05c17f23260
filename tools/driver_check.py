"""Simulate the driver's correctness gate with a BARE SparkSession.

The r1 driver ran queries() with its own SparkSession (none of session.py's
confs: no UTC timezone, no Arrow, default broadcast threshold) and 29/50
queries died on the nanos-parquet read. This harness reproduces that
environment so "passes locally" means "passes the driver gate".

Usage: python tools/driver_check.py [pattern] [sf_dir]
       SPARK_GRAFT_CHECK_SF_DIR=/root/testdata/sf0.1 python tools/driver_check.py

With no explicit sf_dir (arg or env), the gate runs at BOTH sf0.01 and
sf0.1 — the dual-scale pass is the default because three real bugs (HLL
drift, double-sampled range boundaries, round-half disagreement) were
invisible at sf0.01 and only caught at the second scale. Pass an sf_dir
to run a single scale (e.g. while iterating on one query).
"""

from __future__ import annotations

import math
import os
import sys
import time
import traceback
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb
from pyspark.sql import SparkSession

SF_DIR = os.environ.get("SPARK_GRAFT_CHECK_SF_DIR")
DEFAULT_SF_DIRS = ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]


def _canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    if hasattr(v, "timestamp"):
        return v.isoformat()
    import decimal

    if isinstance(v, decimal.Decimal):
        return round(float(v), 9)
    return v


def _rows(cols, data):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_canon(row[i]) for i in order) for row in data]
    return sorted(out, key=repr)


def check_sf(spark, pattern: str, sf_dir: str) -> list:
    """Run the gate for one SF dir; returns the failed-query names."""
    from zenodb_spark import queries as Q

    print(f"== {sf_dir} ==")
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    SF_DIR = sf_dir

    names = [n for n in sorted(Q.QUERIES) if pattern in n]
    failed = []
    for name in names:
        t0 = time.time()
        try:
            sdf = Q.QUERIES[name](spark, SF_DIR)
            scols = sdf.columns
            srows = [[r[c] for c in scols] for r in sdf.collect()]
            if name not in Q.ORACLE:
                print(f"  {name}: rows={len(srows)} (no oracle) {time.time()-t0:.1f}s")
                continue
            res = con.sql(Q.ORACLE[name])
            dcols, drows = res.columns, res.fetchall()
            ok_schema = sorted(scols) == sorted(dcols)
            ok_rows = len(srows) == len(drows)
            s, d = _rows(scols, srows), _rows(dcols, drows)
            mism = [(a, b) for a, b in zip(s, d) if a != b] if ok_rows else []
            ok = ok_schema and ok_rows and not mism
            status = "OK" if ok else "MISMATCH"
            print(
                f"  {name}: {status} spark={len(srows)} oracle={len(drows)} "
                f"{time.time()-t0:.1f}s"
            )
            if not ok:
                failed.append(name)
                if not ok_schema:
                    print(f"    cols: {sorted(scols)} vs {sorted(dcols)}")
                for a, b in mism[:3]:
                    print(f"    spark={a}\n    duck ={b}")
        except Exception:
            failed.append(name)
            print(f"  {name}: ERROR {time.time()-t0:.1f}s")
            traceback.print_exc(limit=3)
    print(f"\n{len(names)-len(failed)}/{len(names)} ok; failed: {failed}")
    return failed


def main() -> int:
    pattern = sys.argv[1] if len(sys.argv) > 1 else ""
    if len(sys.argv) > 2:
        sf_dirs = [sys.argv[2]]
    elif SF_DIR:
        sf_dirs = [SF_DIR]
    else:
        sf_dirs = DEFAULT_SF_DIRS
    # Bare session: mirror the driver, NOT zenodb_spark.session.get_spark.
    spark = (
        SparkSession.builder.appName("driver_check").master("local[16]").getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    rc = 0
    for sf_dir in sf_dirs:
        if check_sf(spark, pattern, sf_dir):
            rc = 1
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
