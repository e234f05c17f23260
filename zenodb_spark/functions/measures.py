"""Measure-side expression functions mirroring the reference's expr/ package.

Reference semantics being reproduced (see SURVEY.md §2.3, §2.8):

- ``IF(cond, agg)``   — conditional aggregation: the wrapped aggregate only
  consumes points whose *dimensions* satisfy cond (reference expr/if.go:16–95).
  Spark-first: ``agg(when(cond, x))`` — null inputs are ignored by all Spark
  aggregates, which is exactly the reference's "unset" behavior.
- ``BOUNDED(x, min, max)`` — values outside [min,max] treated as unset
  (reference expr/bounded.go:14–68).
- ``WAVG(x, w)``      — weighted mean Σxw/Σw (reference expr/avg.go:17–37).
- safe_div            — the reference's div-by-zero convention: x/0 → 0 when
  x == 0 else MaxFloat64 (reference expr/calcs.go:20–28).
- AVG as mergeable state — (sum, count) pairs, finalized at read
  (reference expr/avg.go:52–114). Spark's partial aggregation does this
  natively for one-shot queries; ``exact_avg`` gives the deterministic
  cents-scaled form used by the oracle-gated queries.

Determinism note: ``exact_sum``/``exact_avg`` scale fractional measures to
integer cents (floor(x*scale+0.5)) and sum longs — integer addition is
associative, so results are bit-identical regardless of partitioning or
merge order. That makes results reproducible across cluster sizes (and
hash-comparable against the DuckDB oracle). At 100 TB this costs nothing:
it is still a single map-side-combined hash aggregate.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MAX_FLOAT64 = 1.7976931348623157e308


def IF(cond: Column | str, value: Column | str) -> Column:
    """Conditional-aggregation input: value where cond holds, else null (unset)."""
    cond = F.expr(cond) if isinstance(cond, str) else cond
    value = F.col(value) if isinstance(value, str) else value
    return F.when(cond, value)


def BOUNDED(value: Column | str, lo: float, hi: float) -> Column:
    """Discard values outside [lo, hi] (null = unset, ignored by aggregates)."""
    value = F.col(value) if isinstance(value, str) else value
    return F.when((value >= F.lit(lo)) & (value <= F.lit(hi)), value)


def wavg(value: Column | str, weight: Column | str) -> Column:
    """Weighted average Σ(v·w)/Σ(w); returns null when Σw = 0."""
    value = F.col(value) if isinstance(value, str) else value
    weight = F.col(weight) if isinstance(weight, str) else weight
    return F.sum(value * weight) / F.sum(weight)


def safe_div(num: Column, den: Column) -> Column:
    """Division with the reference's convention: x/0 → 0 if x==0 else MaxFloat64."""
    return (
        F.when(den != 0, num / den)
        .when(num == 0, F.lit(0.0))
        .otherwise(F.lit(MAX_FLOAT64))
    )


def cents(value: Column | str, decimals: int = 2) -> Column:
    """Deterministic fixed-point form of a fractional measure: floor(x·10^d+0.5) as long."""
    value = F.col(value) if isinstance(value, str) else value
    scale = 10**decimals
    return F.floor(value * scale + F.lit(0.5)).cast("long")


def exact_sum(value: Column | str, decimals: int = 2) -> Column:
    """Order-independent (bit-exact) sum of a fractional measure via integer cents."""
    scale = float(10**decimals)
    return F.sum(cents(value, decimals)) / F.lit(scale)


def exact_avg(value: Column | str, decimals: int = 2) -> Column:
    """Order-independent mean: exact integer sum divided by exact count."""
    value = F.col(value) if isinstance(value, str) else value
    scale = float(10**decimals)
    return (F.sum(cents(value, decimals)) / F.lit(scale)) / F.count(value)


def points() -> Column:
    """The reference's implicit ``_points`` field: count of inserted points
    (reference core/core.go:26, encoding/params.go:44–52)."""
    return F.count(F.lit(1))
