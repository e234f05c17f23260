"""Time-axis operators: period buckets, ASOF/UNTIL, STRIDE, SHIFT, CROSSHIFT.

Reference semantics (SURVEY.md §2.3, §2.5, §2.9):

- ``period(d)``  — tumbling time buckets at resolution d; timestamps round
  down to the bucket start (reference encoding/time.go:39–77). Spark-first:
  epoch-aligned integer bucket math or ``window()``/``date_trunc``.
- ``ASOF/UNTIL`` — half-open time range [asof, until) applied as a plain
  filter that Catalyst pushes into the parquet scan via row-group stats
  (reference planner/local.go:110–135).
- ``stride(d)``  — sample one resolution-slice at the start of every stride:
  keep only rows whose bucket phase ``epoch % stride < resolution``, then
  bucket by the stride (reference planner/local.go:144–150,
  encoding/seq.go:309–316).
- ``SHIFT(agg,'dur')`` — the aggregate's value from dur earlier aligned into
  the current bucket (reference expr/shift.go:16–92). On a potentially
  *sparse* bucket axis, a row-offset lag is wrong; we self-join on
  ``bucket - dur`` instead. Scale note: both sides share the same
  (dims, bucket) partitioning, so at 100 TB this is a co-partitioned
  sort-merge join, not a windowed global sort; AQE handles skew.

Bucket columns are exposed both ways:
- ``bucket_epoch`` — BIGINT epoch-seconds bucket start: exact integer math,
  reproducible across engines (used by the oracle-gated queries).
- ``bucket_ts``    — TimestampType bucket start for human-facing results.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from zenodb_spark.sqlparser.durations import parse_duration

__all__ = [
    "bucket_epoch",
    "bucket_ts",
    "time_range",
    "stride_filter",
    "shift_join",
    "crosshift",
    "sessionize",
    "asof_join",
    "interval_join",
]


def _secs(d: str | int | float) -> int:
    return int(parse_duration(d)) if isinstance(d, str) else int(d)


def bucket_epoch(ts: Column | str, period: str | int) -> Column:
    """Epoch-seconds start of the tumbling `period` bucket containing ts."""
    ts = F.col(ts) if isinstance(ts, str) else ts
    p = _secs(period)
    epoch = F.unix_timestamp(ts)
    return (epoch - epoch % F.lit(p)).cast("long")


def bucket_ts(ts: Column | str, period: str | int) -> Column:
    """TimestampType start of the tumbling `period` bucket containing ts."""
    return F.timestamp_seconds(bucket_epoch(ts, period))


def time_range(df: DataFrame, ts_col: str, asof: str | None, until: str | None) -> DataFrame:
    """ASOF '…' UNTIL '…' → half-open [asof, until) filter.

    When the frame still carries the raw int64-nanos column (``ts_ns``, see
    catalog.load_table), an equivalent conjunct on it is added as well: the
    derived µs timestamp is a computed column Catalyst cannot push into the
    parquet scan, but the raw-long range predicate reaches row-group stats —
    at 100 TB that is the difference between scanning a slice and scanning
    everything."""
    import datetime as _dt

    def _epoch(s: str) -> float:
        d = _dt.datetime.fromisoformat(s.replace("Z", "+00:00"))
        if d.tzinfo is None:
            d = d.replace(tzinfo=_dt.timezone.utc)
        return d.timestamp()

    has_ns = "ts_ns" in df.columns
    if asof is not None:
        df = df.filter(F.col(ts_col) >= F.lit(asof).cast("timestamp"))
        if has_ns:
            df = df.filter(F.col("ts_ns") >= F.lit(int(_epoch(asof) * 1e9)))
    if until is not None:
        df = df.filter(F.col(ts_col) < F.lit(until).cast("timestamp"))
        if has_ns:
            df = df.filter(F.col("ts_ns") < F.lit(int(_epoch(until) * 1e9)))
    return df


def stride_filter(df: DataFrame, ts_col: str, stride: str | int, resolution: str | int) -> DataFrame:
    """Keep only the first `resolution` worth of data in every `stride` window."""
    s, r = _secs(stride), _secs(resolution)
    if s % r != 0:
        raise ValueError(f"stride {s}s must be a multiple of resolution {r}s")
    epoch = F.unix_timestamp(F.col(ts_col))
    return df.filter((epoch % F.lit(s)) < F.lit(r))


def shift_join(
    agg_df: DataFrame,
    dims: list[str],
    bucket_col: str,
    value_cols: list[str],
    dur: str | int,
    suffix: str,
) -> DataFrame:
    """Attach `{col}{suffix}` = value of col from `dur` earlier for the same dims.

    Implemented as an equi-join on (dims, bucket - dur): correct on sparse
    bucket axes and co-partitioned with the main aggregation at scale.
    Missing source buckets yield 0.0 (the reference reads absent periods as
    zero — encoding/seq.go reads out-of-range as 0).
    """
    d = _secs(dur)
    shifted = agg_df.select(
        *dims,
        (F.col(bucket_col) + F.lit(d)).alias(bucket_col),
        *[F.col(c).alias(f"{c}{suffix}") for c in value_cols],
    )
    out = agg_df.join(shifted, on=[*dims, bucket_col], how="left")
    for c in value_cols:
        out = out.withColumn(f"{c}{suffix}", F.coalesce(F.col(f"{c}{suffix}"), F.lit(0.0)))
    return out


def crosshift(
    agg_df: DataFrame,
    dims: list[str],
    bucket_col: str,
    value_cols: list[str],
    cutoff: str | int,
    interval: str | int,
    label: str = "_{n}",
) -> DataFrame:
    """CROSSHIFT(x, cutoff, interval): expand into a family of SHIFT columns
    x, x_1, x_2, … covering `cutoff` at `interval` steps (reference
    sql/sql.go:363–422). One join per shift; each join shares the
    (dims, bucket) shuffle key so Catalyst reuses the exchange."""
    c, i = _secs(cutoff), _secs(interval)
    n = 1
    out = agg_df
    off = i
    while off <= c:
        out = shift_join(out, dims, bucket_col, value_cols, off, label.format(n=n))
        off += i
        n += 1
    return out


def sessionize(
    df: DataFrame,
    ts_col: str = "ts",
    key_cols: tuple[str, ...] = ("user_id",),
    gap: str = "30 minutes",
) -> DataFrame:
    """Gap-based sessionization via Spark's native ``session_window``: one
    row per (keys, session) with event count and intra-session duration in
    microseconds. A new session starts when an event arrives >= gap after
    the previous session's last event (Spark merges overlapping
    [ts, ts+gap) windows).

    Scale shape: ONE shuffle on the session keys, sessions merged by the
    native operator inside each partition — no per-event window-function
    pass, no driver state. In streaming the same expression works under
    ``withWatermark`` (SURVEY §2.10)."""
    from zenodb_spark.catalog import epoch_us_col

    t = dict(df.dtypes).get(ts_col, "timestamp")
    return (
        df.groupBy(*key_cols, F.session_window(F.col(ts_col), gap).alias("session"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (
                epoch_us_col(F.max(ts_col), t) - epoch_us_col(F.min(ts_col), t)
            ).alias("dur_us"),
        )
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: tuple[str, ...],
    ts_col: str,
    payload: tuple[str, ...] = (),
    strict: bool = True,
) -> DataFrame:
    """As-of join: attach to every ``left`` row the latest ``right`` row
    with ``right.ts < left.ts`` (``strict``) or ``<=``, per key group.
    Appends ``asof_{ts_col}`` (NULL when no prior right row) plus
    ``asof_{c}`` for each payload column.

    The reference engine has no as-of join; this is a training-pipeline
    extension (point-in-time feature lookup, attribution).

    Scale shape: union the two sides, ONE shuffle on ``keys``, and a
    running ``max(struct(ts, payload…))`` window over the merged order —
    no join, no time-range explosion, no per-key driver state. A
    sort-merge range join would shuffle both sides too but then pay an
    O(n·m) in-bucket scan on hot keys; the running max is strictly linear
    after the sort. Ties: with ``strict`` a right row at the same ts sorts
    AFTER the left row (invisible to it), otherwise before.
    """
    from pyspark.sql.window import Window

    ltypes = dict(left.dtypes)
    rtypes = dict(right.dtypes)
    carry = F.struct(F.col(ts_col), *[F.col(c) for c in payload]).alias("_asof_r")
    rt = right.select(
        *keys,
        F.col(ts_col),
        *[
            F.lit(None).cast(ltypes[c]).alias(c)
            for c in left.columns
            if c not in keys and c != ts_col
        ],
        carry,
        F.lit(1 if strict else 0).alias("_asof_side"),
    )
    null_struct = F.lit(None).cast(
        "struct<{}>".format(
            ",".join(
                [f"{ts_col}:{rtypes[ts_col]}"] + [f"{c}:{rtypes[c]}" for c in payload]
            )
        )
    )
    lt = left.withColumn("_asof_r", null_struct).withColumn(
        "_asof_side", F.lit(0 if strict else 1)
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy(ts_col, "_asof_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = lt.unionByName(rt).withColumn("_asof_last", F.max("_asof_r").over(w))
    out = merged.filter(F.col("_asof_side") == F.lit(0 if strict else 1)).filter(
        # right-side rows carried through the union have a non-null _asof_r
        F.col("_asof_r").isNull()
    )
    cols = [F.col(c) for c in left.columns]
    cols.append(F.col(f"_asof_last.{ts_col}").alias(f"asof_{ts_col}"))
    cols.extend(F.col(f"_asof_last.{c}").alias(f"asof_{c}") for c in payload)
    return out.select(*cols)


def interval_join(
    left: DataFrame,
    right: DataFrame,
    left_point: str,
    right_start: str,
    right_end: str,
    bin_width: int,
    keys: list[str] | None = None,
) -> DataFrame:
    """Point-in-interval join: pair each left row with every right row whose
    half-open interval [start, end) contains the left row's point column.
    All three columns are BIGINT points on the same axis (epoch seconds,
    epoch ns — any integer axis).

    Spark has no native range join: expressing this as a theta-join
    (`l.point >= r.start AND l.point < r.end`) plans a BroadcastNestedLoop /
    cartesian — O(|L|·|R|) comparisons, a non-starter at scale. The standard
    fix (used by the Databricks range-join hint and by Flink's interval
    join) is binning: quantize the axis into bins of ``bin_width``, emit
    each interval once per bin it overlaps (``sequence`` + explode — cost
    |R| · avg_interval_len / bin_width rows), emit each point once into its
    single bin, then equi-join on (keys…, bin) and re-check the exact
    predicate. Every comparison now happens inside one bin of one key — a
    plain shuffle/broadcast HASH join that AQE can size, skew-split, or
    broadcast like any other.

    ``bin_width`` trades explode factor against bin selectivity: pick it
    near the MEDIAN interval length, so typical intervals explode to ~1-2
    rows while a rare giant interval costs len/bin_width rows rather than
    pairing with the whole table. ``keys`` adds equi-key columns (join
    within user_id, within event_type, …) that ride along in the join key.
    """
    keys = keys or []
    bw = int(bin_width)
    if bw <= 0:
        raise ValueError(f"bin_width must be positive, got {bin_width}")
    b = F.lit(bw)

    def _bin(c: Column) -> Column:
        # Exact integral floor-division, long end-to-end. `(c - c % b) / b`
        # would promote long/long to DOUBLE, which has 53 bits of mantissa —
        # on an epoch-nanosecond axis (~1.7e18 today) the bin id can come
        # out off by a few units and silently drop matching pairs (point
        # and interval land in different bins). Subtract the positive
        # remainder (floor semantics for negative points too), then divide
        # as decimal(38,0): the dividend is an exact multiple of b, so the
        # quotient is exact at any long magnitude.
        c = c.cast("long")
        fl = c - (((c % b) + b) % b)
        return (fl.cast("decimal(38,0)") / b).cast("long")

    # end is exclusive: an interval ending exactly on a bin edge does not
    # reach into that bin
    bins = F.sequence(_bin(F.col(right_start)), _bin(F.col(right_end) - F.lit(1)))
    r = right.filter(F.col(right_end) > F.col(right_start)).withColumn(
        "__bin", F.explode(bins)
    )
    l_binned = left.withColumn("__bin", _bin(F.col(left_point)))
    joined = l_binned.join(r, keys + ["__bin"]).filter(
        (F.col(left_point) >= F.col(right_start))
        & (F.col(left_point) < F.col(right_end))
    )
    return joined.drop("__bin")
