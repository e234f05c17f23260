"""CROSSTAB / CROSSTABT — pivot distinct values of an expression into
column groups (reference sql/sql.go:108–123, core/group.go:185–246).

Reference semantics: every output field f becomes `{val}_f` for each
observed value of the crosstab expression (values sorted); CROSSTABT
additionally appends `total_f` columns aggregated over all values.

Spark-first: ``groupBy(dims).pivot(expr).agg(...)`` — Spark's pivot does the
same two-pass distinct-value collection the reference does by buffering
rows. At scale, pass ``values=`` when the distinct set is known to skip the
extra job; the distinct pass itself is a map-side-combined aggregate, fine
at 100 TB when the crosstab expression is low-cardinality (which is the only
regime where a pivot makes sense at all — the reference hard-buffers all
rows otherwise).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def crosstab(
    df: DataFrame,
    group_cols: list[str | Column],
    pivot_col: str | Column,
    aggs: dict[str, Column],
    values: list[str] | None = None,
    totals: bool = False,
    max_values: int = 10_000,
) -> DataFrame:
    """Pivot `pivot_col` into `{val}_{field}` columns.

    aggs: field name → aggregate Column (evaluated per (group, pivot-value)).
    totals: CROSSTABT — also append `total_{field}` over all pivot values.
    max_values: the distinct pivot values are buffered on the driver (same
        two-pass shape as Spark's own ``pivot``); above this cap we fail
        loudly instead of OOMing the driver. Pass explicit ``values`` or a
        larger cap for a known-wide pivot.
    """
    pivot_col = F.col(pivot_col) if isinstance(pivot_col, str) else pivot_col
    df2 = df.withColumn("__ct", pivot_col)
    if values is None:
        rows = df2.select("__ct").distinct().limit(max_values + 1).collect()
        if len(rows) > max_values:
            raise ValueError(
                f"crosstab: pivot expression has more than {max_values} distinct "
                "values; pass values=[...] or raise max_values if intentional"
            )
        values = sorted(r["__ct"] for r in rows if r["__ct"] is not None)
    agg_cols = [agg.alias(name) for name, agg in aggs.items()]
    out = df2.groupBy(*group_cols).pivot("__ct", values).agg(*agg_cols)
    # Spark names pivoted columns "{val}_{alias}" (or just "{val}" for a
    # single agg); normalize to the reference's "{val}_{field}" form.
    if len(aggs) == 1:
        only = next(iter(aggs))
        for v in values:
            if v in out.columns:
                out = out.withColumnRenamed(v, f"{v}_{only}")
    if totals:
        tot = df2.groupBy(*group_cols).agg(
            *[agg.alias(f"total_{name}") for name, agg in aggs.items()]
        )
        on = [c if isinstance(c, str) else c._jc.toString() for c in group_cols]
        out = out.join(tot, on=on, how="left")
    return out
