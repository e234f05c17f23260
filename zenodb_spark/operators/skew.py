"""Skew-safe join and distinct-aggregation primitives.

Hash-partitioned joins and COUNT(DISTINCT) die at 100 TB when one key
holds a disproportionate share of the rows: every row of the hot key
lands in ONE reducer task, so the stage runs at the speed of its worst
key no matter how many executors exist. AQE's skew-join split
(spark.sql.adaptive.skewJoin.enabled, on by default in session.py)
handles the sort-merge case at runtime by splitting oversized partitions;
the operators here are the PLANNED forms for the two cases AQE does not
cover:

- ``salted_join`` — an equi-join where BOTH sides are too large to
  broadcast and the left side's key distribution is skewed. The left
  side gets a deterministic salt in [0, n_salts) derived from md5 of a
  disambiguator column (NOT rand(): retries/speculative tasks must hash
  identically or the join duplicates/drops rows); the right side is
  replicated n_salts× via an explode. The join key becomes
  (key, salt), spreading each hot key over n_salts reducer tasks.
  Replication multiplies the right side's shuffle volume — worth it only
  when the right side is much smaller than the hot key's row count.

- ``distinct_count_skew`` — exact per-key COUNT(DISTINCT v) as two
  chained aggregates: dedupe on (key, v) first (that shuffle spreads a
  hot key across the full cluster because v varies), then count per key.
  Spark's single-step count_distinct plans the same expand+regroup, but
  spelling it out keeps the first shuffle's key-space wide even when the
  planner would collapse it (e.g. under additional grouped aggregates),
  and documents the scale contract.

The reference delegates distribution entirely to its partition-by-dims
clustering (zenodb cluster_*.go); skew within one dimension value has no
answer there — this module is the Spark-side answer.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["salted_join", "distinct_count_skew"]


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    *,
    n_salts: int = 8,
    salt_from: str | Column | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``left ⋈ right`` on ``on`` with the left side salted and
    the right side replicated ``n_salts``×.

    ``salt_from`` names a left-side column (or Column) whose md5 drives
    the salt — deterministic across retries, unlike rand(). Default: the
    concatenation of all left columns (stable, but pass an id column when
    one exists — cheaper). Result rows are identical to the unsalted
    join; only the partitioning of the work changes. Supported ``how``:
    inner / left (semantics preserved because every left row keeps
    exactly its one salt, and every right row exists for every salt)."""
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    if salt_from is None:
        src = F.concat_ws("\x1f", *[F.col(c) for c in left.columns])
    elif isinstance(salt_from, str):
        src = F.col(salt_from)
    else:
        src = salt_from
    salt = F.pmod(
        F.conv(F.substring(F.md5(src.cast("string")), 1, 8), 16, 10).cast("long"),
        F.lit(n_salts),
    )
    lsalted = left.withColumn("__salt", salt)
    rrepl = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn("__salt", F.col("__salt").cast("long"))
    out = lsalted.join(rrepl, on + ["__salt"], how)
    return out.drop("__salt")


def distinct_count_skew(
    df: DataFrame,
    keys: list[str],
    value: str,
    out_col: str = "n_distinct",
) -> DataFrame:
    """Exact COUNT(DISTINCT value) per keys, skew-safe by construction:
    the dedupe shuffle partitions on (keys + value) — a hot key's rows
    spread over as many tasks as it has distinct values — and only the
    tiny per-(key,value) survivors flow into the per-key count."""
    return (
        df.select(*keys, value)
        .distinct()
        .groupBy(*keys)
        .agg(F.count(F.lit(1)).alias(out_col))
    )
