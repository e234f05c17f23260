"""Shared operator utilities."""

from __future__ import annotations

import math
import os
from urllib.parse import unquote, urlparse

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def sql_double(x: float) -> str:
    """SQL literal text of one FINITE double: Python ``repr`` round-trips
    doubles exactly and Spark's ``D`` suffix parses with java.lang.Double
    semantics, so the parsed Literal is bitwise the ``F.lit(x)`` tree
    (verified incl. denormals, ±0.0 and max-double — TestLitVec). The one
    place this serialization lives; non-finite values have no SQL literal
    form — callers must check :func:`all_finite` first and fall back to
    per-element ``F.lit`` construction."""
    return repr(float(x)) + "D"


def all_finite(xs) -> bool:
    """True when every element of ``xs`` (floats) is finite — the
    :func:`sql_double` eligibility check."""
    return all(map(math.isfinite, xs))


def lit_vec(xs) -> Column:
    """Constant ``array<double>`` literal built in ONE Py4J round-trip.

    ``F.array(*[F.lit(float(x)) for x in xs])`` costs dim+1 JVM round-trips
    per vector — profiled at 0.5-2.5 s of pure driver-side chatter for an
    8x64 model (512 literals), which dominated q33/q63/q107's bench time.
    Parsing ``array(<repr>D, ...)`` in one ``F.expr`` call yields the SAME
    CreateArray(Literal double) tree: Python ``repr`` round-trips doubles
    exactly and Spark's ``D`` suffix parses with java.lang.Double semantics
    (bitwise-verified incl. denormals, +-0.0 and max-double). Non-finite
    values have no SQL literal form and fall back to the per-element path.
    """
    xs = [float(x) for x in xs]
    if not xs or not all_finite(xs):
        return F.array(*[F.lit(x) for x in xs])
    return F.expr("array(" + ",".join(sql_double(x) for x in xs) + ")")


def lit_mat(rows) -> Column:
    """Constant ``array<array<double>>`` literal (one ``F.expr`` parse).

    Same contract and bitwise guarantee as :func:`lit_vec`, one level up:
    a whole plane/centroid matrix rides the plan as ONE parsed expression
    instead of rows x (dim+1) JVM round-trips. Non-finite rows fall back to
    per-row :func:`lit_vec` construction."""
    rows = [[float(x) for x in r] for r in rows]
    if not rows or not all(all_finite(r) for r in rows):
        return F.array(*[lit_vec(r) for r in rows])
    return F.expr(
        "array("
        + ",".join("array(" + ",".join(sql_double(x) for x in r) + ")" for r in rows)
        + ")"
    )


def _scan_file_size(spark, uri: str) -> int:
    """Byte size of one scan file (driver-side, no job). Local paths are
    stat'ed directly; anything else goes through the Hadoop FileSystem of
    its own scheme. Unknown/unreadable files count as 0 — the caller's
    threshold errs toward NOT materializing, which is only ever a local
    fixed-cost question (see maybe_checkpoint)."""
    p = urlparse(uri)
    if p.scheme in ("", "file"):
        try:
            return os.path.getsize(unquote(p.path))
        except OSError:
            return 0
    try:
        jvm = spark._jvm
        jpath = jvm.org.apache.hadoop.fs.Path(uri)
        fs = jpath.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
        return fs.getFileStatus(jpath).getLen()
    except Exception:
        return 0


# Below this input size, recomputing a shared subtree once per consumer is
# cheaper than the extra materialization job a localCheckpoint schedules:
# the whole input fits in one or two scan tasks, so each re-scan costs
# milliseconds while the checkpoint job pays fixed scheduling + block-write
# cost (measured round 6/7: +0.1-0.5 s per query at sf0.1 under the bench's
# count action). The break-even is a LOCAL fixed-cost question, independent
# of cluster size — at any real corpus size the gate fires and the
# round-6 one-pass shape (N corpus scans -> 1) is preserved unchanged.
_CKPT_MIN_BYTES_DEFAULT = 3 * 1024 * 1024
# At or above this many scan files the input is assumed big without
# stat'ing each file: checkpointing data this size is at worst a small
# fixed cost, while per-file driver-side stats are not.
_CKPT_MANY_FILES = 64


def checkpoint_worthwhile(df: DataFrame) -> bool:
    """True when ``df``'s scan input is big enough that materializing a
    shared subtree derived from it beats re-scanning once per consumer.

    Input size is the summed byte size of the frame's scan files
    (``inputFiles`` — analysis-only, no job, the same probe ``spread``
    uses), with early exit once the threshold is crossed. Frames with no
    scan files (in-memory test frames, already-checkpointed parents)
    report False: callers whose subtree sits ABOVE another checkpoint
    must gate on the original SOURCE frame, not the derived one.

    ``SPARK_GRAFT_CHECKPOINT_MIN_BYTES`` overrides the threshold
    (<= 0 forces checkpointing unconditionally — used by tests and by
    deployments whose scan cost per byte is unusually high)."""
    try:
        min_bytes = int(
            os.environ.get(
                "SPARK_GRAFT_CHECKPOINT_MIN_BYTES", _CKPT_MIN_BYTES_DEFAULT
            )
        )
    except ValueError:
        min_bytes = _CKPT_MIN_BYTES_DEFAULT
    if min_bytes <= 0:
        return True
    try:
        files = df.inputFiles()
    except Exception:
        files = []
    if len(files) >= _CKPT_MANY_FILES:
        return True
    total = 0
    for uri in files:
        total += _scan_file_size(df.sparkSession, uri)
        if total >= min_bytes:
            return True
    return False


def maybe_checkpoint(df: DataFrame, eager: bool = True, gate_df: DataFrame | None = None) -> DataFrame:
    """Size-adaptive ``localCheckpoint``: materialize a shared
    multi-consumer subtree only when its input scan is big enough that
    re-scanning it once per consumer costs more than one materialization
    job (guide §2.4 / §5; the round-7 fix for round 6's bench-scale
    checkpoint regressions). Semantically a no-op either way — consumers
    see identical rows whether the subtree is materialized or recomputed.

    ``gate_df`` sizes the decision on a different frame (the raw source)
    when ``df`` itself sits above another checkpoint, whose LogicalRDD
    reports no input files."""
    if checkpoint_worthwhile(df if gate_df is None else gate_df):
        return df.localCheckpoint(eager=eager)
    return df


def spread(df: DataFrame) -> DataFrame:
    """Repartition only when the input is under-partitioned relative to the
    cluster (e.g. a single unsplittable file): pairwise vector math and
    shingle explodes are CPU-bound, and Catalyst adds no parallelism below a
    narrow chain — with a broadcast join the whole pipeline inherits the
    scan's partitioning.

    Under-partitioning is detected from the scan's file listing
    (``inputFiles``), NOT ``df.rdd`` — converting to RDD lineage forces plan
    materialization and hides the frame from AQE. A real corpus has ≥ cores
    input files, so this is a no-op with no added shuffle at scale; a
    single-file local read (or an in-memory test frame, which reports zero
    input files) gets one explicit round-robin spread."""
    sc = df.sparkSession.sparkContext
    try:
        nfiles = len(df.inputFiles())
    except Exception:
        nfiles = 0
    if nfiles < sc.defaultParallelism:
        return df.repartition(sc.defaultParallelism)
    return df
