"""Round-7 (second optimization round) pins: the size-adaptive checkpoint
gate, the CC fast-lane byte gate, the 64-bit lsh_fingerprint base, and the
q68 null-user-id fixture assumption."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from tests.conftest import SF_ORACLE, SF_SMOKE


def _is_checkpointed(df) -> bool:
    # a localCheckpoint truncates the plan to a LogicalRDD leaf
    return "LogicalRDD" in df._jdf.queryExecution().analyzed().toString()


class TestMaybeCheckpoint:
    """maybe_checkpoint materializes a shared subtree only above the input
    size gate; below it the frame passes through untouched (round 7 — the
    fix for round 6's bench-scale checkpoint regressions)."""

    def test_small_input_passes_through(self, spark, monkeypatch, tmp_path):
        from zenodb_spark.operators.util import maybe_checkpoint

        monkeypatch.delenv("SPARK_GRAFT_CHECKPOINT_MIN_BYTES", raising=False)
        p = str(tmp_path / "small.parquet")
        spark.range(100).write.parquet(p)
        df = spark.read.parquet(p).withColumn("y", F.col("id") * 2)
        out = maybe_checkpoint(df)
        assert out is df  # pass-through, no materialization
        assert out.count() == 100

    def test_env_zero_forces_checkpoint(self, spark, monkeypatch, tmp_path):
        from zenodb_spark.operators.util import maybe_checkpoint

        monkeypatch.setenv("SPARK_GRAFT_CHECKPOINT_MIN_BYTES", "0")
        df = spark.range(10).withColumn("y", F.col("id") * 2)
        out = maybe_checkpoint(df)
        assert _is_checkpointed(out)
        assert sorted(r["y"] for r in out.collect()) == [2 * i for i in range(10)]

    def test_big_input_checkpoints(self, spark, monkeypatch, tmp_path):
        from zenodb_spark.operators.util import maybe_checkpoint

        monkeypatch.setenv("SPARK_GRAFT_CHECKPOINT_MIN_BYTES", "1")
        p = str(tmp_path / "big.parquet")
        spark.range(100).write.parquet(p)
        df = spark.read.parquet(p)
        assert _is_checkpointed(maybe_checkpoint(df))

    def test_in_memory_frame_passes_through(self, spark, monkeypatch):
        from zenodb_spark.operators.util import maybe_checkpoint

        monkeypatch.delenv("SPARK_GRAFT_CHECKPOINT_MIN_BYTES", raising=False)
        df = spark.createDataFrame([Row(x=1), Row(x=2)])
        assert maybe_checkpoint(df) is df

    def test_gate_df_sizes_on_the_source(self, spark, monkeypatch, tmp_path):
        """A frame above another checkpoint reports no input files; gate_df
        lets it size the decision on the raw source scan (q165's w)."""
        from zenodb_spark.operators.util import maybe_checkpoint

        p = str(tmp_path / "src.parquet")
        spark.range(50).write.parquet(p)
        src = spark.read.parquet(p)
        monkeypatch.setenv("SPARK_GRAFT_CHECKPOINT_MIN_BYTES", "1")
        base = maybe_checkpoint(src)
        assert _is_checkpointed(base)
        derived = base.withColumn("y", F.col("id") + 1)
        assert len(derived.inputFiles()) == 0  # why gate_df exists
        out = maybe_checkpoint(derived, gate_df=src)
        assert _is_checkpointed(out)
        # and without gate_df the derived frame would (wrongly) skip
        assert maybe_checkpoint(derived) is derived


class TestCcDriverByteGate:
    """The CC fast lane must refuse to collect edge lists whose estimated
    Python-object footprint exceeds the byte gate, even when the edge
    COUNT is under the edge gate (round 7, VERDICT r6 item 6)."""

    @staticmethod
    def _labels(df):
        return sorted((r["node"], r["lab"]) for r in df.collect())

    def test_fat_string_ids_choose_distributed(self, spark, monkeypatch):
        from zenodb_spark.operators.dedup import connected_components

        fat = "x" * 2000
        e = spark.createDataFrame(
            [Row(doc_a=f"{fat}{i}", doc_b=f"{fat}{i + 1}") for i in range(20)]
        )
        monkeypatch.setenv("SPARK_GRAFT_CC_DRIVER_MAX_BYTES", str(8 * 1024))
        st = {}
        dist = connected_components(e, stats=st)
        assert st["rounds"] >= 1, st  # byte gate forced the distributed path
        monkeypatch.setenv("SPARK_GRAFT_CC_DRIVER_MAX_BYTES", str(64 * 1024 * 1024))
        st2 = {}
        fast = connected_components(e, stats=st2)
        assert st2["rounds"] == 0, st2
        assert self._labels(fast) == self._labels(dist)

    def test_long_ids_unchanged(self, spark, monkeypatch):
        from zenodb_spark.operators.dedup import connected_components

        monkeypatch.delenv("SPARK_GRAFT_CC_DRIVER_MAX_BYTES", raising=False)
        rng = random.Random(3)
        e = spark.createDataFrame(
            [Row(doc_a=rng.randrange(40), doc_b=rng.randrange(40)) for _ in range(30)]
        ).filter("doc_a != doc_b")
        st = {}
        connected_components(e, stats=st)
        assert st["rounds"] == 0, st  # small long-id graphs stay on the fast lane


class TestLshFingerprintLongBase:
    """shiftleft over a LONG base: plane indices >= 31 must contribute
    2^j exactly (the old int base overflowed to -2^31 at j=31 — ADVICE
    r6). Callers today use <= 16 planes; this pins the general contract."""

    def test_bits_above_31_are_exact(self, spark):
        from zenodb_spark.operators.similarity import lsh_fingerprint

        # plane j is [+1] (dot >= 0, bit set) or [-1] (bit clear)
        set_bits = {0, 5, 30, 31, 32, 33}
        planes = [[1.0] if j in set_bits else [-1.0] for j in range(34)]
        df = spark.createDataFrame([Row(v=[1.0])])
        got = df.select(lsh_fingerprint("v", planes).alias("fp")).collect()[0]["fp"]
        assert got == sum(1 << j for j in set_bits)

    def test_more_than_62_planes_rejected(self, spark):
        from zenodb_spark.operators.similarity import lsh_fingerprint

        with pytest.raises(ValueError, match="62"):
            lsh_fingerprint("v", [[1.0]] * 63)


class TestQ68NullUserAssumption:
    """q68's scan-level `user_id IS NOT NULL` alignment filter is a no-op
    IFF the events fixture carries no null user_ids (VERDICT r6 item 7) —
    pin that so a future fixture change fails loudly here instead of
    silently shifting q68's view-stage counts."""

    @pytest.mark.parametrize("sf_dir", [SF_SMOKE, SF_ORACLE])
    def test_events_user_id_never_null(self, spark, sf_dir):
        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        assert ev.filter(F.col("user_id").isNull()).count() == 0
