"""Round-3 additions: operator-level crosstab guard, paragraph dedup,
Bloom-filter decontamination, unigram LM scoring, dialect set ops."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from zenodb_spark.operators.crosstab import crosstab


def test_crosstab_operator_cardinality_guard(spark):
    df = spark.range(100).withColumn("k", F.col("id") % 50)
    with pytest.raises(ValueError, match="distinct"):
        crosstab(df, ["id"], F.col("k"), {"n": F.count(F.lit(1))}, max_values=10)
    # explicit values bypass the distinct pass entirely (no cap applies)
    out = crosstab(
        df.withColumn("g", F.lit(1)),
        ["g"],
        F.col("k").cast("string"),
        {"n": F.count(F.lit(1))},
        values=["0", "1"],
        max_values=1,
    )
    row = out.collect()[0]
    assert row["0_n"] == 2 and row["1_n"] == 2
