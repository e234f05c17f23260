"""The driver runs __spark_entry__ with a BARE SparkSession (none of
session.py's confs) from its own process. Rounds 1 and 2 both died on
environment-dependent load bugs that the repo-session test suite could not
see (nanos-parquet conf; a functions-API name). This test replicates that
environment exactly — subprocess, bare builder, driver-style invocation —
so the failure class stays dead.
"""

from __future__ import annotations

import subprocess
import sys
import textwrap

SCRIPT = textwrap.dedent(
    """
    import importlib.util, sys
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", "/root/repo/__spark_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    from pyspark.sql import SparkSession
    spark = (SparkSession.builder.master("local[4]")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    # entry smoke (events table: the historically fragile load path)
    n = len(mod.entry(spark).collect())
    assert n > 0, "entry returned no rows"
    qs, os_ = mod.queries(), mod.oracle_sql()
    assert set(os_) <= set(qs), "oracle without query"
    # one events-based query and one engine query end-to-end at sf0.001
    for name in ("q01_sum_period", "z10_engine_order_limit"):
        df = qs[name](spark, "/root/testdata/sf0.001")
        assert len(df.collect()) > 0, name
    print("DRIVER_CONTRACT_OK", n, len(qs))
    """
)


def test_bare_session_driver_contract():
    r = subprocess.run(
        [sys.executable, "-c", SCRIPT],
        capture_output=True,
        text=True,
        timeout=600,
        cwd="/tmp",
    )
    assert r.returncode == 0, r.stderr[-3000:]
    assert "DRIVER_CONTRACT_OK" in r.stdout
