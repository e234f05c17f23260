"""Distribution-drift statistics for corpus QA (extension beyond the
reference per BASELINE.json's north star — no reference equivalent):
exact two-sample Kolmogorov–Smirnov distance per group, and Pearson
chi-square contingency contributions. Both are engine-exact: every
comparison happens on integer cross-products, with a single trailing
IEEE division (KS) or per-cell micro-quantization before integer sums
(chi-square, the ln() policy from queries.py's determinism rules)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def ks_distance_by_group(df: DataFrame, group_col: str, value_col: str) -> DataFrame:
    """Exact two-sample KS statistic of each group's ``value_col``
    distribution vs the REST of the frame: D = max_x |F_g(x) − F_rest(x)|.

    Returns (group_col, n_docs, ks). Exactness: with cum1 = #{group ≤ x},
    cum2 = #{rest ≤ x}, D = max |cum1·n2 − cum2·n1| / (n1·n2) — the max runs
    over INTEGER cross-products, so both the argmax and the one trailing
    division are engine-independent. Overflow-safe to ~3e9 rows
    (cum·n ≤ N² < 2⁶³).

    Scale shape: the CDF grid is (groups × distinct values) — a broadcast
    cross of two aggregates bounded by the value domain, never the raw
    frame; cumulative sums are per-group windows over that grid. Suited to
    bounded/discretized axes (lengths, scores, bucketed floats); a
    continuous axis should be quantized first (the KS of the quantized
    distributions lower-bounds the true D by at most one bin's mass)."""
    d = df.select(F.col(group_col).alias("g"), F.col(value_col).alias("x"))
    c1 = d.groupBy("g", "x").agg(F.count(F.lit(1)).alias("c"))
    grps = d.groupBy("g").agg(F.count(F.lit(1)).alias("n1"))
    xs = d.select("x").distinct()
    tot = d.groupBy("x").agg(F.count(F.lit(1)).alias("ct"))
    nn = d.agg(F.count(F.lit(1)).alias("nn"))
    grid = xs.crossJoin(F.broadcast(grps))
    j = (
        grid.join(c1, ["g", "x"], "left")
        .join(tot, "x")
        .withColumn("c", F.coalesce(F.col("c"), F.lit(0)))
    )
    wc = (
        Window.partitionBy("g")
        .orderBy("x")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cums = j.select(
        "g",
        "n1",
        F.sum("c").over(wc).alias("cum1"),
        F.sum("ct").over(wc).alias("cumt"),
    )
    ks = (
        cums.crossJoin(F.broadcast(nn))
        .groupBy("g")
        .agg(
            F.max(
                F.abs(
                    F.col("cum1") * (F.col("nn") - F.col("n1"))
                    - (F.col("cumt") - F.col("cum1")) * F.col("n1")
                )
            ).alias("dint"),
            F.max("n1").alias("n1"),
            F.max("nn").alias("nn"),
        )
    )
    return ks.select(
        F.col("g").alias(group_col),
        F.col("n1").cast("long").alias("n_docs"),
        # a group that IS the whole frame has an empty complement: D is
        # undefined → NULL (guards the ANSI divide-by-zero, found by the
        # hypothesis parity test on single-group inputs)
        F.when(
            F.col("nn") > F.col("n1"),
            F.col("dint") / (F.col("n1") * (F.col("nn") - F.col("n1"))),
        ).alias("ks"),
    )


def chi2_contingency(df: DataFrame, row_col: str, col_col: str) -> DataFrame:
    """Pearson chi-square contributions per ``row_col`` over the FULL
    row × column grid (zero cells included — they carry (R·C/N)/1e6 mass
    that a sparse observed-only pass would silently drop).

    Returns (row_col, n_cells, chi2_contrib) with chi2_contrib =
    Σ_col (O−E)²/E for that row. Each cell term is ((O·N − R·C)ᵈ)² /
    (N·R·C)ᵈ — exact integers into a fixed IEEE sequence — micro-quantized
    BEFORE the per-row integer sum, so group totals are associative-exact.
    Overflow-safe to ~3e9 rows (O·N, R·C < 2⁶³). The grid is a broadcast
    cross of two category-bounded aggregates."""
    o = df.groupBy(F.col(row_col).alias("r_"), F.col(col_col).alias("c_")).agg(
        F.count(F.lit(1)).alias("o")
    )
    r = o.groupBy("r_").agg(F.sum("o").alias("r"))
    c = o.groupBy("c_").agg(F.sum("o").alias("c"))
    n = o.agg(F.sum("o").alias("n"))
    grid = r.crossJoin(F.broadcast(c))
    diff = (
        F.coalesce(F.col("o"), F.lit(0)) * F.col("n") - F.col("r") * F.col("c")
    ).cast("double")
    term = (
        diff
        * diff
        / (
            F.col("n").cast("double")
            * F.col("r").cast("double")
            * F.col("c").cast("double")
        )
    )
    cells = (
        grid.join(o, ["r_", "c_"], "left")
        .crossJoin(F.broadcast(n))
        .select(
            "r_",
            F.floor(term * F.lit(1000000.0) + F.lit(0.5)).cast("long").alias("term_micro"),
        )
    )
    return cells.groupBy("r_").agg(
        F.count(F.lit(1)).alias("n_cells"),
        (F.sum("term_micro") / F.lit(1000000.0)).alias("chi2_contrib"),
    ).withColumnRenamed("r_", row_col)
