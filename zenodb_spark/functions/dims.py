"""Dimension-side expression functions mirroring the reference's goexpr
surface (registration table at reference sql/sql.go:76–123).

All implemented with JVM-side built-ins — no Python UDFs — so they stay
inside whole-stage codegen and push down where Catalyst allows.

Geo/ISP/Redis lookups (CITY/ISP/HGET/…, reference sql/sql.go:81–106) are
modeled as *pluggable broadcast lookup tables*: the reference queries live
MaxMind/Redis services per row; at 100 TB scale a broadcast hash join
against a periodically-refreshed dimension snapshot is the right Spark
shape. ``lookup()`` below implements that join.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def CONCAT(sep: str, *cols: Column | str) -> Column:
    """CONCAT(sep, a, b, …) — reference sql/sql.go:117. Note: concat_ws
    SKIPS null parts (no dangling separator); goexpr's Concat renders every
    part, so a nil middle dim would keep its separators there. concat_ws is
    the saner behavior and what the DuckDB oracle uses; documented
    deviation."""
    return F.concat_ws(sep, *[F.col(c) if isinstance(c, str) else c for c in cols])


def SPLIT(col: Column | str, sep: str, idx: int) -> Column:
    """SPLIT(s, sep, idx) — 0-based element after split (reference
    sql/sql.go:98). The separator is a LITERAL string (goexpr Split uses
    strings.Split), so escape it before handing it to F.split's Java regex —
    SPLIT(host, '.', 0) must split on dots, not on every character."""
    import re

    col = F.col(col) if isinstance(col, str) else col
    return F.split(col, re.escape(sep)).getItem(idx)


def SUBSTR(col: Column | str, start: int, length: int) -> Column:
    """SUBSTR(s, start, len) — 1-based start (reference sql/sql.go:99)."""
    col = F.col(col) if isinstance(col, str) else col
    return F.substring(col, start, length)


def REPLACEALL(col: Column | str, pattern: str, replacement: str) -> Column:
    """Regex replace-all (reference sql/sql.go:100)."""
    col = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(col, pattern, replacement)


def LEN(col: Column | str) -> Column:
    col = F.col(col) if isinstance(col, str) else col
    return F.length(col)


def ANY(*cols: Column | str) -> Column:
    """First non-null value (reference sql/sql.go:120) → coalesce."""
    return F.coalesce(*[F.col(c) if isinstance(c, str) else c for c in cols])


def ARRAY(*cols: Column | str) -> Column:
    return F.array(*[F.col(c) if isinstance(c, str) else c for c in cols])


def DECODE(col: Column | str, *pairs_and_default) -> Column:
    """Oracle-style DECODE(v, k1, r1, k2, r2, …, default) — reference sql/sql.go:122."""
    col = F.col(col) if isinstance(col, str) else col
    *pairs, default = pairs_and_default
    if len(pairs) % 2 != 0:
        raise ValueError("DECODE requires key/result pairs plus a default")
    expr: Column | None = None
    for i in range(0, len(pairs), 2):
        cond = col == F.lit(pairs[i])
        expr = F.when(cond, F.lit(pairs[i + 1])) if expr is None else expr.when(cond, F.lit(pairs[i + 1]))
    assert expr is not None
    return expr.otherwise(F.lit(default))


def RAND() -> Column:
    """Random [0,1) for WHERE-sampling (reference sql/sql.go:76–78)."""
    return F.rand()


def lookup(df: DataFrame, table: DataFrame, key_col: str, lookup_key: str, value_cols: list[str]) -> DataFrame:
    """Pluggable enrichment standing in for CITY/ISP/HGET (reference
    sql/sql.go:81–106): broadcast hash join against a small dimension
    snapshot — the scalable substitute for per-row service lookups."""
    return df.join(
        F.broadcast(table.select(lookup_key, *value_cols)),
        df[key_col] == table[lookup_key],
        "left",
    ).drop(lookup_key)


DIM_FUNCTIONS: dict[str, Callable] = {
    "CONCAT": CONCAT,
    "SPLIT": SPLIT,
    "SUBSTR": SUBSTR,
    "REPLACEALL": REPLACEALL,
    "LEN": LEN,
    "ANY": ANY,
    "ARRAY": ARRAY,
    "DECODE": DECODE,
    "RAND": RAND,
}


def register_dim_function(name: str, fn: Callable) -> None:
    """RegisterUnaryDIMFunction-equivalent extension point (reference sql/sql.go:125–133)."""
    DIM_FUNCTIONS[name.upper()] = fn


def register_lookup(name: str, mapping: dict, default=None) -> None:
    """Register an enrichment function backed by a small lookup snapshot —
    the pluggable stand-in for the reference's per-row MaxMind/Redis calls
    (CITY/ISP/HGET…, reference sql/sql.go:81–106, zenodb.go:256–276).

    The mapping becomes a broadcast map literal, evaluated JVM-side. For
    lookups too large to inline (>~100k entries), enrich with
    ``lookup()``'s broadcast join before aggregation instead.
    """
    entries: list[Column] = []
    for k, v in mapping.items():
        entries += [F.lit(k), F.lit(v)]
    map_lit = F.create_map(*entries) if entries else F.create_map()

    def fn(key: Column | str) -> Column:
        key = F.col(key) if isinstance(key, str) else key
        got = F.element_at(map_lit, key.cast("string"))
        return F.coalesce(got, F.lit(default)) if default is not None else got

    DIM_FUNCTIONS[name.upper()] = fn


def _unregistered(name: str) -> Callable:
    def fn(*_args):
        raise ValueError(
            f"{name} requires a registered lookup snapshot: call "
            f"register_lookup({name!r}, mapping) with e.g. a MaxMind/Redis export"
        )

    return fn


# Enrichment functions from the reference's goexpr surface: pluggable here.
for _n in ("CITY", "REGION", "REGION_CITY", "COUNTRY_CODE", "ISP", "ORG", "ASN", "ASNAME", "HGET", "SISMEMBER", "LUA"):
    DIM_FUNCTIONS.setdefault(_n, _unregistered(_n))
