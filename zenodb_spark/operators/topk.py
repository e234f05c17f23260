"""ORDER BY / OFFSET / LIMIT — top-k (SURVEY.md §2.6).

The reference materializes and sorts all rows (core/sort.go:44–130); Spark's
ORDER BY + LIMIT compiles to TakeOrderedAndProject — a per-partition top-k
followed by a k-row merge on the driver — which is the correct 100 TB shape
(no global sort ever materializes).

Deterministic tie-break: callers should include a unique column in the sort
key so LIMIT yields a stable set across engines and partitionings.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame


def topk(df: DataFrame, order: list[Column], limit: int | None, offset: int = 0) -> DataFrame:
    out = df.orderBy(*order)
    if offset:
        out = out.offset(offset)
    if limit is not None:
        out = out.limit(limit)
    return out
