"""DB facade: schema registry, tables as materialized aggregates, batch
ingest, and SQL queries over stored state.

Mirrors the reference's lifecycle (SURVEY.md §3) Spark-first:

- ``DB.apply_schema`` — YAML/dict of table definitions, dependency-ordered
  creation of views (reference schema.go:72–128). Re-applying updates
  definitions (the reference live-alters; we re-register — new state shape
  applies to subsequent ingests; documented deviation).
- ``DB.insert`` — points go to a *stream*; every table/view subscribed to
  that stream folds them into its own (dims…, bucket) state rows
  (reference insert.go:67–268). Ingest appends *partial* state parts —
  the memstore-flush model: queries merge parts on read, ``compact()``
  folds them down (LSM-ish, exactly how the reference's filestore merges
  memstore flushes).
- ``DB.query`` — the ZenoDB SQL dialect over stored tables: state merge to
  query resolution, derived expressions, HAVING, crosstab, SHIFT,
  IN-subqueries, FROM-subqueries, ORDER/LIMIT (reference planner/local.go).

Scale notes: state parts are plain DataFrames (parquet-backed when a
workdir is given); part-append is embarrassingly parallel, merge-on-read is
one hash aggregate keyed (dims, bucket) with map-side combine. Retention is
a bucket-range filter → partition pruning on the bucket column.
"""

from __future__ import annotations

import datetime as dt
import re
from contextlib import contextmanager
from dataclasses import dataclass, field as dfield

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from zenodb_spark.ir import (
    DimConst,
    DimExpr,
    DimIn,
    DimInSubquery,
    DimLogical,
    DimMarker,
    DimNot,
    GroupDim,
    MAgg,
    MBin,
    MConst,
    MCrosshift,
    MExpr,
    MFieldRef,
    MIf,
    MPercentile,
    MPresence,
    MShift,
    Query,
    SelectField,
    SetOp,
)
from zenodb_spark.plans import compiler as C
from zenodb_spark.plans.compiler import (
    BUCKET_COL,
    StateRegistry,
    agg_key,
    aggregate_raw,
    collect_agg_leaves,
    compile_dim,
    dim_truth,
    finalize_expr,
    merge_states,
)
from zenodb_spark.sqlparser.durations import format_duration, parse_duration
from zenodb_spark.sqlparser.parser import parse

TIME_COL = "_time"
DAY_COL = "_day"  # persisted-store partition directory key
DAY_SEC = 86400


class EngineOutOfMemory(RuntimeError):
    """Graceful memory-pressure abort — the engine-level equivalent of the
    reference's ErrOutOfMemory (zenodb.go:510–549, query.go:129–139: abort
    the QUERY with a clear error instead of letting the process die). A
    collection that hits a JVM memory failure mid-sort/agg surfaces as this
    error with remediation guidance, never a raw task-failure stack."""


_OOM_MARKERS = (
    "SparkOutOfMemoryError",
    "OutOfMemoryError",
    "Unable to acquire",
    "Not enough memory to build and broadcast",
    "TaskMemoryManager",
)


@contextmanager
def memory_guard(context: str = "query"):
    """Translate JVM memory failures (surfacing as Py4J errors whose text
    carries the JVM stack) into EngineOutOfMemory. Wrap COLLECTION sites
    (web/RPC result streaming, explicit collects) — plan building is lazy
    and cannot OOM."""
    try:
        yield
    except EngineOutOfMemory:
        raise
    except Exception as e:
        msg = str(e)
        if any(m in msg for m in _OOM_MARKERS):
            raise EngineOutOfMemory(
                f"{context} aborted under memory pressure (executor memory "
                "exhausted). Remedies: rerun when co-tenant load subsides, "
                "raise spark.sql.shuffle.partitions, narrow the ASOF/UNTIL "
                "range, or add executor memory. Original failure: "
                + msg[:500]
            ) from e
        raise


def resolve_time(s: str, now: float) -> float:
    """ASOF/UNTIL values: RFC3339 timestamps or signed durations relative to
    now (reference sql/sql.go:1220–1227)."""
    s = s.strip()
    try:
        return now + parse_duration(s)
    except ValueError:
        pass
    iso = s.replace("Z", "+00:00")
    d = dt.datetime.fromisoformat(iso)
    if d.tzinfo is None:
        d = d.replace(tzinfo=dt.timezone.utc)
    return d.timestamp()


def _max_shift_seconds(exprs) -> float:
    """Largest backward time offset any SHIFT/CROSSHIFT in ``exprs`` reads —
    how far below ASOF the stored-state scan must extend (reference
    encoding/seq.go:244–276 reads the shifted source from asOf+shift)."""
    import dataclasses

    best = 0.0

    def walk(e):
        nonlocal best
        if isinstance(e, MShift):
            best = max(best, float(e.dur))
        elif isinstance(e, MCrosshift):
            best = max(best, float(e.cutoff))
        if dataclasses.is_dataclass(e) and not isinstance(e, type):
            for f in dataclasses.fields(e):
                v = getattr(e, f.name)
                if isinstance(v, MExpr):
                    walk(v)
                elif isinstance(v, (list, tuple)):
                    for x in v:
                        if isinstance(x, MExpr):
                            walk(x)

    for e in exprs:
        if e is not None:
            walk(e)
    return best


def _explode_array_vals(df: DataFrame, val_names: set[str] | None = None) -> DataFrame:
    """Array-valued measures fan out per element (reference insert.go:213–252):
    element[0] rides the main insert alongside the point's scalar measures;
    each later element becomes a sub-insert carrying ONLY that measure (every
    other measure column — scalar or array — nulled). A point with a scalar
    val and an n-element array val thus contributes its scalar measures once
    and counts as n points, matching the reference."""
    array_cols = [f.name for f in df.schema.fields if isinstance(f.dataType, T.ArrayType)]
    if not array_cols:
        return df
    # Measure columns = declared val names plus all array-valued columns.
    measures = set(array_cols) | {
        n for n in (val_names or set()) if n in df.columns
    }
    dtypes = {f.name: f.dataType for f in df.schema.fields}
    # Main insert: scalars intact, each array collapsed to its first element.
    base = df
    for c in array_cols:
        base = base.withColumn(c, F.col(c).getItem(0).cast("double"))
    parts = [base]
    for c in array_cols:
        part = df
        for other in measures:
            if other != c:
                target = "double" if other in array_cols else dtypes[other]
                part = part.withColumn(other, F.lit(None).cast(target))
        # Elements 1..n-1 only (element 0 already on the main insert).
        tail = F.slice(F.col(c), 2, F.greatest(F.size(F.col(c)) - 1, F.lit(0)))
        part = part.withColumn(c, F.explode(tail)).withColumn(
            c, F.col(c).cast("double")
        )
        parts.append(part)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


@dataclass
class TableDef:
    name: str
    sql: str
    retention: float | None = None
    backfill: float | None = None
    partition_by: list[str] = dfield(default_factory=list)
    virtual: bool = False
    view: bool = False


class Table:
    def __init__(self, db: "DB", tdef: TableDef, q: Query, fields: list[SelectField]):
        self.db = db
        self.tdef = tdef
        self.query_ir = q
        self.fields = fields  # effective fields (views: resolved vs parent)
        self.stream = q.from_table
        self.resolution = q.resolution or 1.0
        self.where = q.where
        self.group_by = list(q.group_by)
        self.group_by_all = q.group_by_all
        self.dims: list[str] | None = [g.name for g in self.group_by] if not q.group_by_all else None
        self.registry: StateRegistry | None = None
        self._parts: list[DataFrame] = []
        # streaming exactly-once ledger: stream-part path → index in _parts,
        # or None once compact() folded it into main. A replayed micro-batch
        # (crash after the parquet write, before the checkpoint commit)
        # REPLACES its slot / is skipped instead of double-counting.
        self._stream_seen: dict[str, int | None] = {}
        self._materialized = False
        self.created_at = db.now()  # backfill depth anchors here
        self._load_persisted()

    def _load_persisted(self) -> None:
        """Re-open a persisted store (workdir/{table}) without replaying
        data: the registry is rebuilt deterministically from the table
        definition; GROUP BY * dims are recovered from the stored schema."""
        if not self.db.workdir:
            return
        import os

        path = f"{self.db.workdir}/{self.tdef.name}"
        if not os.path.isdir(path):
            return
        from zenodb_spark.plans.compiler import build_registry

        parts = []
        if os.path.isdir(f"{path}/main"):
            parts.append(self.db.spark.read.parquet(f"{path}/main"))
        elif any(f.endswith(".parquet") for f in os.listdir(path)):
            parts.append(self.db.spark.read.parquet(path))  # legacy flat layout
        for sub in sorted(os.listdir(path)):
            if sub.startswith("stream_part="):
                parts.append(self.db.spark.read.parquet(f"{path}/{sub}"))
                self._stream_seen[f"{path}/{sub}"] = len(parts) - 1
        if not parts:
            return
        self.registry = build_registry(self.fields)
        state_cols = {s.col for s in self.registry.all_specs()}
        # state-format version gate: v1 COUNTDISTINCT states (`_sN__dset`)
        # used an incompatible encoding; the current suffix is `dsetv2`.
        # Refuse to silently merge a stale store — the fix is recompute
        # (drop the store dir) or an offline re-encode, never a quiet merge.
        import re as _re

        legacy = [
            c
            for c in parts[0].columns
            if c.endswith("__dset")
            or c.endswith("__hll")
            # pre-ALTER-support stores named the implicit points counter by
            # registration index (_sN__points); it is now the fixed
            # _s__points so field APPENDs can't re-bind it. Refuse a silent
            # zero-points merge.
            or _re.fullmatch(r"_s\d+__points", c)
        ]
        if legacy:
            raise ValueError(
                f"table {self.tdef.name!r}: persisted state columns {legacy} "
                "use the v1 COUNTDISTINCT format; current format is dsetv2 "
                "(sorted string array). Recompute the store (delete "
                f"{path}) or re-encode offline before reopening."
            )
        if self.dims is None:
            self.dims = [
                c
                for c in parts[0].columns
                if c not in (BUCKET_COL, DAY_COL) and c not in state_cols
            ]
        self._parts = parts
        self._materialized = len(parts) == 1  # parquet-backed; >1 still needs a fold
        self.db._invalidate_plans()

    # -- live ALTER (reference schema.go:16-55 + table_alter semantics) ------
    def alter_compatible(self, q: Query) -> bool:
        """A changed definition can be applied IN PLACE (stored parts kept)
        when only the FIELD list / retention / backfill / partition-by
        moved: the stream, grouping, resolution and ingest filter must
        match, because stored rows are keyed by (dims…, bucket) under that
        filter and cannot be re-derived from state."""
        return (
            q.from_table == self.stream
            and (q.resolution or 1.0) == self.resolution
            and list(q.group_by) == self.group_by
            and q.group_by_all == self.group_by_all
            and q.where == self.where
        )

    def alter(self, tdef: TableDef, q: Query, fields: list[SelectField]) -> None:
        """Apply a field-list change without dropping stored state (the
        reference live-alters tables when the watched schema file moves).

        New fields' state columns are simply ABSENT from old parts:
        state_df unions with allowMissingColumns, and every merge kind is
        null-safe (sum/min/max skip nulls; collect_list drops them), so
        pre-ALTER buckets read the new field as empty — the reference's
        zeros-before-the-field-existed semantics. Dropped fields stop being
        selected; their stored columns become dead weight until the next
        compact() rewrites the canonical part without them.

        Stored state column names carry the field-registration INDEX, so an
        ALTER is refused (loudly) if re-using an index would silently bind
        an old column to a different aggregate — append new fields rather
        than reordering, or change the table name to rebuild."""
        from zenodb_spark.plans.compiler import build_registry

        if self.registry is not None:
            new_reg = build_registry(fields)
            old = {s.key: s.col for s in self.registry.all_specs()}
            new = {s.key: s.col for s in new_reg.all_specs()}
            moved = sorted(k for k in old.keys() & new.keys() if old[k] != new[k])
            rev_old: dict[str, str] = {}
            for k, c in old.items():
                rev_old.setdefault(c, k)
            stolen = sorted(
                c for k, c in new.items() if k not in old and rev_old.get(c, k) != k
            )
            if moved or stolen:
                raise ValueError(
                    f"table {self.tdef.name!r}: ALTER would re-bind stored state "
                    f"columns (reordered aggs: {moved}; name collisions: {stolen}). "
                    "Append new fields instead of reordering, or rename the table "
                    "to rebuild from the stream."
                )
            self.registry = new_reg
        self.tdef = tdef
        self.query_ir = q
        self.fields = fields

    # -- ingest -------------------------------------------------------------
    def ingest(self, points: DataFrame, ts_col: str = "ts") -> None:
        df = _explode_array_vals(points, self._val_names())
        if self.tdef.backfill is not None:
            # Backfill limit: historical replay depth is bounded from table
            # creation time; fresher points always flow (reference
            # table.go:50-52, 161-167).
            cutoff = self.created_at - self.tdef.backfill
            df = df.filter(F.col(ts_col) >= F.timestamp_seconds(F.lit(cutoff)))
        if self.where is not None:
            resolve = lambda n: F.col(n) if n in df.columns else F.lit(None)
            df = df.filter(dim_truth(compile_dim(self.where, resolve)))
        if self.dims is None:
            # GROUP BY *: every non-ts, non-numeric-measure column is a dim
            val_names = self._val_names()
            self.dims = [
                f.name
                for f in points.schema.fields
                if f.name != ts_col
                and f.name not in val_names
                and not isinstance(f.dataType, (T.ArrayType,))
            ]
        group_dims = self._group_dim_cols(df)
        registry = StateRegistry()
        state, registry = aggregate_raw(
            df, self.fields, group_dims, self.resolution, ts_col, registry
        )
        if self.registry is None:
            self.registry = registry
        self._parts.append(state)
        self._materialized = False
        self.db._invalidate_plans()

    def _val_names(self) -> set[str]:
        out: set[str] = set()

        def walk(e: MExpr):
            if isinstance(e, MFieldRef):
                out.add(e.name)
            elif isinstance(e, MAgg):
                walk(e.arg)
                if e.weight:
                    walk(e.weight)
            elif isinstance(e, (MIf,)):
                walk(e.inner)
            elif isinstance(e, MPercentile):
                walk(e.inner)
            elif isinstance(e, MBin):
                walk(e.left)
                walk(e.right)
            elif hasattr(e, "inner"):
                walk(e.inner)

        for f in self.fields:
            walk(f.expr)
        return out

    def _group_dim_cols(self, df: DataFrame):
        resolve = lambda n: F.col(n) if n in df.columns else F.lit(None)
        if self.group_by:
            return [(g.name, compile_dim(g.expr, resolve)) for g in self.group_by]
        return [(d, resolve(d)) for d in self.dims or []]

    # -- state access ---------------------------------------------------------
    def state_df(self, asof: int | None = None, until: int | None = None) -> DataFrame:
        """Stored state, optionally pre-filtered to [asof, until) bucket
        epochs. Persisted parts are day-partitioned (``_day`` directory key):
        time-range and retention predicates are applied to BOTH the
        partition column (directory pruning — at 100 TB the difference
        between listing a few day dirs and the whole store) and the bucket
        column (row-group stats within a day)."""
        if not self._parts:
            raise ValueError(f"table {self.tdef.name} has no data")
        cutoff: int | None = None
        if self.tdef.retention is not None:
            cutoff = int((self.db.now() - self.tdef.retention) // self.resolution * self.resolution)
        cached = self.db._scan_cache.get(self.tdef.name)
        if cached is not None:
            # coalesced-scan path (DB.query_many): every concurrent query
            # reads the one persisted merged state; time filters apply to
            # the bucket column on top of the shared cache (directory
            # pruning is traded for scanning once instead of N times —
            # the reference's iteration-coalescing trade, table.go:398)
            out = cached
            for lo in (cutoff, asof):
                if lo is not None:
                    out = out.filter(F.col(BUCKET_COL) >= F.lit(lo))
            if until is not None:
                out = out.filter(F.col(BUCKET_COL) < F.lit(until))
            return out
        parts = []
        for p in self._parts:
            if DAY_COL in p.columns:
                if asof is not None:
                    p = p.filter(F.col(DAY_COL) >= F.lit(asof // DAY_SEC))
                if until is not None:
                    p = p.filter(F.col(DAY_COL) <= F.lit(until // DAY_SEC))
                if cutoff is not None:
                    p = p.filter(F.col(DAY_COL) >= F.lit(cutoff // DAY_SEC))
                p = p.drop(DAY_COL)
            parts.append(p)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p, allowMissingColumns=True)
        if cutoff is not None:
            out = out.filter(F.col(BUCKET_COL) >= F.lit(cutoff))
        if asof is not None:
            out = out.filter(F.col(BUCKET_COL) >= F.lit(asof))
        if until is not None:
            out = out.filter(F.col(BUCKET_COL) < F.lit(until))
        return out

    def _write_store(self, df: DataFrame, path: str) -> DataFrame:
        """Write a state part day-partitioned and reopen it (retention →
        partition drop; ASOF/UNTIL → partition pruning).

        Writes to a tmp dir then swaps: the plan being written may READ the
        current store (compaction folds the existing parts), so an in-place
        overwrite would delete its own input mid-job."""
        import os
        import shutil

        out = df.withColumn(DAY_COL, F.floor(F.col(BUCKET_COL) / F.lit(DAY_SEC)).cast("long"))
        # partitionBy dims (reference TableOpts.PartitionBy — the follower
        # distribution key, table.go:34–64): cluster files by those dims and
        # sort rows by (dims…, bucket) so dim filters prune via parquet
        # row-group stats and co-partitioned reads stay co-located
        pby = [d for d in self.tdef.partition_by if d in df.columns]
        if pby:
            out = out.repartition(*[F.col(d) for d in pby]).sortWithinPartitions(
                *[F.col(d) for d in pby], F.col(BUCKET_COL)
            )
        tmp = f"{path}__tmp"
        out.write.mode("overwrite").partitionBy(DAY_COL).parquet(tmp)
        if os.path.exists(path):
            shutil.rmtree(path)
        os.replace(tmp, path)
        return self.db.spark.read.parquet(path)

    def compact(self) -> None:
        """Fold appended partial-state parts into one canonical, MATERIALIZED
        part (the reference's flush-merge, row_store.go:351–508).

        Materialization matters as much as the fold: a table is a stored
        aggregate, so queries — including both sides of a SHIFT self-join —
        must read the (small) state, not re-aggregate the raw stream per
        query. With a workdir the state becomes parquet; without one it is
        persisted memory-and-disk."""
        if self.registry is None or not self._parts:
            return
        if len(self._parts) == 1 and self._materialized:
            return
        old_parts = list(self._parts)
        if len(self._parts) > 1:
            merged = merge_states(
                self.state_df(),
                self.registry,
                [(d, F.col(d)) for d in self.dims or []],
                self.resolution,
                self.resolution,
            )
        else:
            merged = self._parts[0]
        if self.db.workdir:
            # consolidated store lives under main/ — sibling stream_part=N
            # dirs keep their own partition discovery separate
            path = f"{self.db.workdir}/{self.tdef.name}/main"
            merged = self._write_store(merged, path)
            import os
            import shutil

            base = f"{self.db.workdir}/{self.tdef.name}"
            for sub in os.listdir(base):
                if sub.startswith("stream_part="):
                    shutil.rmtree(f"{base}/{sub}", ignore_errors=True)
        else:
            from pyspark import StorageLevel

            merged = merged.persist(StorageLevel.MEMORY_AND_DISK)
            merged.count()  # materialize BEFORE releasing the sources
        # Unpersist-discipline (round-4 verdict item 7): the folded stream
        # parts were persisted per micro-batch (ingest.py) and the previous
        # compact's merged part may itself be persisted — dropping the
        # references without unpersisting leaks CacheManager entries for
        # the life of the session. merged is materialized above (parquet
        # write or count), so releasing its sources cannot trigger a
        # recompute of freed lineage.
        for p in old_parts:
            if p is not merged:
                try:
                    p.unpersist(False)
                except Exception:
                    pass
        self._parts = [merged]
        # folded stream parts stay in the ledger (value None) so a late
        # checkpoint replay of an already-folded batch is skipped, not
        # re-ingested
        self._stream_seen = {k: None for k in self._stream_seen}
        self._materialized = True
        self.db._invalidate_plans()


class DB:
    def __init__(
        self,
        spark: SparkSession,
        workdir: str | None = None,
        now=None,
        in_splice_max: int = 10_000,
        crosstab_max_values: int = 10_000,
    ):
        self.spark = spark
        self.workdir = workdir
        self.tables: dict[str, Table] = {}
        self.virtual_defs: dict[str, tuple[Query, list[SelectField]]] = {}
        self.streams: list = []  # active StreamingQuery handles (force_fresh)
        self._now = now  # virtual clock (reference zenodb.go:81–83)
        # IN-subquery value sets at most this large splice into the predicate
        # (reference planner/subquery.go collects always); larger sets stay
        # distributed as a membership join so a high-cardinality dim can't
        # OOM the driver.
        self.in_splice_max = in_splice_max
        # crosstab pivots buffer the distinct column values on the driver
        # (same as Spark's own pivot()); fail loudly past this cap.
        self.crosstab_max_values = crosstab_max_values
        # DB.query_many coalesced-scan state (reference table.go:398-521)
        self._scan_cache: dict[str, DataFrame] = {}
        self._coalesced_scans: list[DataFrame] = []
        # Prepared-PLAN cache (round 6, guide §1/§2: lowering a dialect
        # statement costs ~1,500 Py4J round-trips — measured 0.9-1.1 s for
        # the percentile re-read query vs 0.4 s of execution). Maps SQL
        # text → lowered DataFrame. This caches the PLAN only: every
        # action on the returned frame re-executes against the stored
        # state, exactly like a prepared statement. Entries are dropped
        # whenever ANY table state mutates (ingest/compact/reopen/schema
        # change — see _plan_cacheable for the time-dependence rules).
        self._plan_cache: dict[str, DataFrame] = {}
        self._plan_epoch = 0  # bumped by _invalidate_plans (store-if-unchanged guard)

    def now(self) -> float:
        if self._now is not None:
            return self._now() if callable(self._now) else float(self._now)
        return dt.datetime.now(dt.timezone.utc).timestamp()

    # -- schema -------------------------------------------------------------
    def apply_schema(self, schema: dict) -> None:
        """Create/replace tables from a schema mapping (YAML-shaped:
        name → {sql, retentionperiod, virtual, view, partitionby…})."""
        defs: dict[str, TableDef] = {}
        for name, opts in schema.items():
            defs[name.lower()] = TableDef(
                name=name.lower(),
                sql=opts["sql"],
                retention=parse_duration(opts["retentionperiod"])
                if opts.get("retentionperiod")
                else None,
                backfill=parse_duration(opts["backfill"]) if opts.get("backfill") else None,
                partition_by=[p.lower() for p in opts.get("partitionby", [])],
                virtual=bool(opts.get("virtual")),
                view=bool(opts.get("view")),
            )
        # dependency order: plain tables & virtuals first, then views (by depth)
        remaining = dict(defs)
        progress = True
        while remaining and progress:
            progress = False
            for name in list(remaining):
                tdef = remaining[name]
                # idempotent re-apply (the reference polls its schema file
                # every second, schema.go:16–55): an unchanged definition is
                # a no-op and keeps stored state; a CHANGED definition
                # rebuilds the table — live in-place ALTER is a documented
                # deviation (stored state columns are derived from the field
                # list; re-ingest after changing a definition)
                existing = self.tables.get(name)
                if existing is not None and existing.tdef == tdef:
                    del remaining[name]
                    progress = True
                    continue
                q = parse(tdef.sql)
                parent = q.from_table
                if tdef.view and parent not in self.tables and parent not in self.virtual_defs:
                    continue  # wait for parent
                self._create(tdef, q)
                del remaining[name]
                progress = True
        if remaining:
            raise ValueError(f"unresolvable view dependencies: {sorted(remaining)}")
        # any create/alter invalidates prepared plans (and a retention
        # change flips cacheability for the whole DB)
        self._invalidate_plans()

    def apply_schema_yaml(self, text: str) -> None:
        self.apply_schema(_parse_simple_yaml(text))

    def apply_schema_file(self, path: str) -> None:
        with open(path) as f:
            self.apply_schema_yaml(f.read())

    def watch_schema(self, path: str, interval: float = 1.0):
        """Apply the schema file now and keep polling it for changes,
        re-applying when mtime/size moves (reference schema.go:16–55 polls
        every second and live-alters tables). Returns a handle with
        ``.stop()``; the poll runs on a daemon thread — pure driver-side
        control flow, no Spark jobs unless the file actually changed."""
        import os
        import threading

        self.apply_schema_file(path)
        stat = os.stat(path)
        stop = threading.Event()

        def loop() -> None:
            nonlocal stat
            while not stop.wait(interval):
                try:
                    new_stat = os.stat(path)
                except OSError:
                    continue
                if new_stat.st_mtime > stat.st_mtime or new_stat.st_size != stat.st_size:
                    stat = new_stat
                    try:
                        self.apply_schema_file(path)
                    except Exception as e:  # keep polling; reference logs and continues
                        print(f"watch_schema: apply failed: {e}")

        t = threading.Thread(target=loop, name="zenodb-schema-watch", daemon=True)
        t.start()

        class _Watch:
            def stop(self) -> None:
                stop.set()
                t.join(timeout=interval + 1)

        return _Watch()

    def _create(self, tdef: TableDef, q: Query) -> None:
        # a BASE table must declare its resolution via period() — the
        # reference rejects CreateTable without one (zenodb_test.go:156–162,
        # "missing a resolution"); views inherit the parent's (view_a in the
        # same fixture has no period)
        if not tdef.view and not q.resolution:
            raise ValueError(
                f"table {tdef.name} is missing a resolution: declare "
                "period(...) in its GROUP BY"
            )
        fields = list(q.fields)
        if tdef.view:
            parent_name = q.from_table
            if parent_name in self.tables:
                parent = self.tables[parent_name]
                parent_q, parent_fields = parent.query_ir, parent.fields
            else:
                parent_q, parent_fields = self.virtual_defs[parent_name]
            # view re-consumes the parent's stream with inherited/merged spec
            # (reference table.go:194–250)
            eff = Query()
            eff.from_table = parent_q.from_table
            eff.resolution = q.resolution or parent_q.resolution
            if q.group_by or q.group_by_none:
                eff.group_by = q.group_by
                eff.group_by_all = False
            else:
                eff.group_by = list(parent_q.group_by)
                eff.group_by_all = parent_q.group_by_all
            if parent_q.where is not None and q.where is not None:
                eff.where = DimLogical("AND", parent_q.where, q.where)
            else:
                eff.where = q.where or parent_q.where
            by_name = {
                f.name: MAgg("SUM", f.expr, None) if isinstance(f.expr, MFieldRef) else f.expr
                for f in parent_fields
            }
            if q.select_star or not fields:
                fields = list(parent_fields)
            else:
                fields = [
                    SelectField(f.name, _substitute_refs(f.expr, by_name)) for f in fields
                ]
            q = eff
        if tdef.virtual:
            self.virtual_defs[tdef.name] = (q, fields)
            return
        existing = self.tables.get(tdef.name)
        if existing is not None and existing.alter_compatible(q):
            existing.alter(tdef, q, fields)
            return
        self.tables[tdef.name] = Table(self, tdef, q, fields)

    # -- ingest -------------------------------------------------------------
    def insert(self, stream: str, points: DataFrame, ts_col: str = "ts") -> None:
        stream = stream.lower()
        for t in self.tables.values():
            if t.stream == stream:
                t.ingest(points, ts_col)

    def insert_rows(self, stream: str, rows: list[dict]) -> None:
        self.insert(stream, self.spark.createDataFrame(rows))

    # -- query --------------------------------------------------------------
    def table_stats(
        self, name: str, dim_cardinalities: bool = False, k: int = 256
    ) -> dict:
        """Per-table stats the reference reports alongside query results
        (table.go:569-601, common/common.go:57-64): stored row count,
        bucket range, high-water mark (max bucket epoch — the freshness
        signal), and part count (memstore-vs-filestore analog: parts not
        yet folded by compact()).

        With ``dim_cardinalities``, adds a per-dimension distinct-count
        estimate over the STORED state via the KMV sketch (the same
        construction as the ``COUNTDISTINCT(x, k)`` dialect state and
        operators/sketch.py — exact below k, (k-1)/h_(k) above, ~1/sqrt(k)
        error): one extra pass over the state, O(k·dims) driver bytes at
        any table cardinality — the dashboard cardinality panel."""
        if name not in self.tables:
            raise ValueError(f"unknown table {name}")
        t = self.tables[name]
        if t.registry is None or not t._parts:
            return {
                "table": name, "rows": 0, "parts": 0,
                "min_bucket": None, "max_bucket": None, "high_water": None,
            }
        agg = t.state_df().agg(
            F.count(F.lit(1)).alias("rows"),
            F.min(BUCKET_COL).alias("mn"),
            F.max(BUCKET_COL).alias("mx"),
        ).collect()[0]
        out = {
            "table": name,
            "rows": agg["rows"],
            "parts": len(t._parts),
            "min_bucket": agg["mn"],
            "max_bucket": agg["mx"],
            "high_water": agg["mx"],
        }
        if dim_cardinalities and t.dims:
            from zenodb_spark.operators.sketch import kmv_sketch

            pairs = (
                t.state_df()
                .select(
                    F.explode(
                        F.array(
                            *[
                                F.struct(
                                    F.lit(d).alias("dim"),
                                    F.col(d).cast("string").alias("val"),
                                )
                                for d in t.dims
                            ]
                        )
                    ).alias("e")
                )
                .select("e.dim", "e.val")
                .filter(F.col("val").isNotNull())
            )
            sk = kmv_sketch(pairs, ["dim"], "val", k=k)
            est = F.when(
                F.size("kmin") < k, F.size("kmin").cast("double")
            ).otherwise(
                F.lit(float(k - 1))
                / F.greatest(
                    F.conv(F.substring(F.element_at("kmin", k), 1, 8), 16, 10)
                    .cast("long")
                    / F.lit(4294967296.0),
                    F.lit(2.0**-32),
                )
            )
            out["dim_cardinalities"] = {
                r["dim"]: r["est"]
                for r in sk.select("dim", est.alias("est")).collect()
            }
        return out

    def query_many(self, sqls: list[str]) -> list[DataFrame]:
        """Coalesced execution of concurrent queries (reference
        table.go:398–521: iterations arriving within a window share one
        filestore scan). Spark analog: persist each touched table's merged
        state ONCE (MEMORY_AND_DISK), plan every query against the shared
        cache, and unpersist when all results have been consumed (here:
        after materialization — callers that stream should call
        ``DB.release_scan_cache()`` instead). The scan + state-merge cost is
        paid once per table instead of once per query."""
        from pyspark import StorageLevel

        parsed = [parse(s) for s in sqls]

        def tables_of(q) -> set[str]:
            if isinstance(q, SetOp):
                return tables_of(q.left) | tables_of(q.right)
            if q.from_subquery is not None:
                return tables_of(q.from_subquery)
            return {q.from_table} if q.from_table in self.tables else set()

        touched = set().union(*[tables_of(q) for q in parsed]) if parsed else set()
        for name in sorted(touched):
            t = self.tables[name]
            if t.registry is not None and t._parts:
                merged = t.state_df().persist(StorageLevel.MEMORY_AND_DISK)
                self._scan_cache[name] = merged
                self._coalesced_scans.append(merged)
        try:
            return [self.plan(q) for q in parsed]
        finally:
            # the returned plans hold the persisted frames by reference;
            # clearing the registry keeps LATER single queries from pinning
            # a stale cache. The frames stay persisted until
            # release_scan_cache().
            self._scan_cache.clear()

    def release_scan_cache(self) -> None:
        """Unpersist the shared scans created by ``query_many`` (call after
        consuming the results)."""
        for df in self._coalesced_scans:
            df.unpersist(False)
        self._coalesced_scans.clear()

    def explain(self, sql: str, mode: str = "formatted") -> str:
        """Formatted physical plan of a dialect query — the reference logs
        its operator tree via FormatSource (core/format.go:8-29,
        query.go:50); here Catalyst's plan IS the operator tree, which is
        strictly more informative (exchanges, pushed filters, codegen
        spans)."""
        df = self.plan(parse(sql))
        return df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), mode
        )

    _PLAN_CACHE_MAX = 64

    def _invalidate_plans(self) -> None:
        """Drop every prepared plan; called from every table-state
        mutation site (ingest/compact/reopen/schema/maintenance). The
        epoch bump closes the lower-while-mutating race: a query thread
        that began lowering BEFORE a concurrent mutation must not store
        its (now stale) plan after this clear."""
        self._plan_epoch += 1
        self._plan_cache.clear()

    def _plan_cacheable(self, sql: str) -> bool:
        """True when ``sql`` lowers to a plan that depends only on the SQL
        text and the current table state (both captured by the cache key +
        mutation invalidation). Excluded, conservatively by text match:

        - ASOF/UNTIL — relative forms resolve against ``now()`` at lowering
          time, so the same text can legitimately lower to different plans;
        - RAND — an unseeded rand() fixes its seed at analysis, so a cached
          plan would repeat one "random" stream instead of redrawing;
        - any table with retention — the truncation cutoff is a now()-
          derived literal baked into the scan (state_df), same staleness
          class as relative ASOF.
        """
        low = sql.lower()
        if "asof" in low or "until" in low or "rand" in low:
            return False
        return all(t.tdef.retention is None for t in self.tables.values())

    def query(self, sql: str) -> DataFrame:
        q = parse(sql)
        if q.force_fresh:
            # `-- force_fresh`: drain pending stream micro-batches before
            # reading, the reference's include-memstore flag (query.go:28–32)
            # (a drain that folds new batches mutates table state, which
            # clears the plan cache before the lookup below)
            for s in list(self.streams):
                s.drain()
        key = sql if self._plan_cacheable(sql) else None
        if key is not None:
            hit = self._plan_cache.get(key)
            if hit is not None:
                return hit
        epoch0 = self._plan_epoch
        out = self.plan(q)
        if key is not None and self._plan_epoch == epoch0:
            if len(self._plan_cache) >= self._PLAN_CACHE_MAX:
                self._plan_cache.pop(next(iter(self._plan_cache)), None)
            self._plan_cache[key] = out
        return out

    def explain(self, sql: str, mode: str = "formatted") -> str:
        """Formatted PHYSICAL plan of a dialect query without executing it —
        the reference CLI's plan introspection surface, answered by
        Catalyst (`df.explain` text): shows the exchanges, pushed filters,
        and codegen stages the dialect statement lowers to. ``mode`` is any
        Spark explain mode (simple|extended|codegen|cost|formatted)."""
        sql = sql.strip()
        if sql.upper().startswith("EXPLAIN "):
            sql = sql[len("EXPLAIN ") :]
        df = self.plan(parse(sql))
        return df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), mode
        )

    def plan(self, q: Query | SetOp) -> DataFrame:
        if isinstance(q, SetOp):
            return self._plan_set_op(q)
        if q.from_subquery is not None:
            inner = self.plan(q.from_subquery)
            return self._aggregate_flat(q, inner, self._flat_fields(q.from_subquery))
        name = q.from_table
        if name in self.virtual_defs:
            raise ValueError(f"table {name} is virtual and cannot be queried")
        if name not in self.tables:
            raise ValueError(f"unknown table {name}")
        return self._plan_over_table(q, self.tables[name])

    def _plan_set_op(self, q: SetOp) -> DataFrame:
        """UNION[/ALL] / INTERSECT[/ALL] / EXCEPT[/ALL] between dialect
        queries (extension — SURVEY §2.6: absent in the reference, native in
        Spark). Columns align by position, names from the left operand;
        distinct variants are one extra hash-aggregate shuffle, the ALL
        variants none (union) or one co-partitioned anti/semi shuffle."""
        left, right = self.plan(q.left), self.plan(q.right)
        if len(left.columns) != len(right.columns):
            raise ValueError(
                f"set operation operands have {len(left.columns)} vs "
                f"{len(right.columns)} columns"
            )
        right = right.toDF(*left.columns)
        if q.op == "union_all":
            out = left.unionAll(right)
        elif q.op == "union":
            out = left.unionAll(right).distinct()
        elif q.op == "intersect":
            out = left.intersect(right)
        elif q.op == "intersect_all":
            out = left.intersectAll(right)
        elif q.op == "except":
            out = left.subtract(right)
        elif q.op == "except_all":
            out = left.exceptAll(right)
        else:
            raise ValueError(f"unknown set operation {q.op!r}")
        return self._order_limit(out, q)

    # -- query over a stored table ------------------------------------------
    def _plan_over_table(self, q: Query, table: Table) -> DataFrame:
        registry = table.registry
        if registry is None:
            raise ValueError(f"table {table.tdef.name} has no data")
        res_out = q.resolution or table.resolution
        now = self.now()

        # ASOF / UNTIL: RoundTimeUp to the TABLE resolution (reference
        # planner/local.go:119–121 + encoding/time.go:39–45) — a partial
        # first STORED bucket is excluded, a partial last one included; the
        # range is pushed into state_df so day-partition pruning and bucket
        # row-group stats both apply. (Output buckets stay epoch-anchored —
        # SURVEY §1.3's documented deviation from until-anchored sequences —
        # so an unaligned ASOF yields a partial first output bucket.)
        tres = int(round(table.resolution))
        rup = lambda v: int(-(-int(round(v * 1000)) // (tres * 1000)) * tres)
        asof = rup(resolve_time(q.asof, now)) if q.asof else None
        until = rup(resolve_time(q.until, now)) if q.until else None
        # a period longer than the [asof, until) window narrows to the
        # window (reference planner/local.go:152–167), then must still be
        # an even multiple of the table resolution
        bucket_anchor = 0
        if asof is not None and until is not None and res_out > until - asof > 0:
            res_out = float(until - asof)
            if round(res_out) % tres != 0:
                raise ValueError(
                    f"query resolution {res_out}s (truncated to the ASOF/UNTIL "
                    f"window) is not an even multiple of table resolution {tres}s"
                )
            # the single window bucket is [asof, until), not an epoch-grid
            # cell (the reference's sequences anchor at until)
            bucket_anchor = asof
        # SHIFT/CROSSHIFT read SOURCE data from before ASOF by their offset
        # (reference encoding/seq.go:244–276 truncates the shifted source at
        # asOf+shift and grows the merge window): extend the scan downward by
        # the largest shift, then trim the OUTPUT back to [asof, until) below
        # — otherwise the first in-range buckets lose their true lag values.
        shift_ext = _max_shift_seconds(
            [f.expr for f in q.fields] + ([q.having] if q.having is not None else [])
        )
        read_asof = asof
        if asof is not None and shift_ext > 0:
            r = table.resolution
            read_asof = int((asof - shift_ext) // r * r)
        state = table.state_df(read_asof, until)
        out_min_ts = asof if read_asof != asof else None

        # WHERE over stored dims (IN-subqueries pre-executed, reference
        # planner/subquery.go). A name that is not a stored dim — a measure
        # or a typo — resolves to NULL, the reference's "unknown dim = nil,
        # comparisons not-true" rule (goexpr; expr/field.go:44-47), so the
        # filter cleanly matches nothing instead of raising mid-plan.
        dim_cols = set(state.columns)
        state = self._apply_where(
            state,
            q.where,
            lambda n: F.col(n) if n in dim_cols else F.lit(None),
        )

        # STRIDE: keep only the first strideSlice of each stride, where
        # strideSlice = the QUERY resolution (period if given, else table
        # resolution) — reference planner/local.go:144–150 sets
        # strideSlice=resolution then resolution=stride
        if q.stride:
            if round(q.stride) % round(table.resolution) != 0:
                raise ValueError("stride must be a multiple of the table resolution")
            state = state.filter(
                (F.col(BUCKET_COL) % F.lit(int(q.stride))) < F.lit(int(res_out))
            )
            res_out = max(res_out, q.stride)

        # shift-extended read + ASOF unaligned to the OUTPUT grid: stored
        # rows in [first-output-bucket-start, asof) belong to the partial
        # first bucket's PAST, not its base aggregates — exclude them so the
        # extension feeds only the shift columns (lower whole buckets)
        if out_min_ts is not None:
            grid = int(round(res_out))
            b0 = bucket_anchor + (asof - bucket_anchor) // grid * grid
            if b0 != asof:
                state = state.filter(
                    (F.col(BUCKET_COL) >= F.lit(asof)) | (F.col(BUCKET_COL) < F.lit(b0))
                )
            out_min_ts = b0

        # output dims — unknown dim names inside GROUP BY expressions read
        # as nil (reference expr/field.go:44-47), so ANY(missing, k, 'x')
        # falls through instead of failing analysis
        dim_resolve = lambda n: F.col(n) if n in state.columns else F.lit(None)
        if q.group_by_none:
            out_dims: list[tuple[str, object]] = []
        elif q.group_by_all or not q.group_by:
            out_dims = [(d, F.col(d)) for d in (table.dims or [])]
        else:
            out_dims = [(g.name, compile_dim(g.expr, dim_resolve)) for g in q.group_by]

        # fields (SELECT * expands to all table fields + _points)
        fields = list(q.fields)
        if q.select_star or not fields:
            star = [SelectField(POINTS := "_points", MFieldRef("_points"))] + [
                SelectField(f.name, MFieldRef(f.name)) for f in table.fields
            ]
            seen = {f.name for f in fields}
            fields = fields + [f for f in star if f.name not in seen]

        # SELECT aliases are referenceable from HAVING/ORDER BY (reference
        # sql_test.go: HAVING Rate > 15 with rate defined in the SELECT).
        # The map starts EMPTY and grows as fields are rewritten in order —
        # the reference resolves a name against fields defined EARLIER in
        # the select list, else the stored field (sql/sql.go:720–738,
        # fieldsMap), so `SHIFT(v, '1d') AS v` reads the stored v instead of
        # recursing into its own alias.
        query_aliases: dict[str, MExpr] = {}

        def field_lookup(n: str) -> MExpr:
            if n in query_aliases:
                return query_aliases[n]
            if n == "_points":
                return MAgg("SUM", MFieldRef("_point"), None)
            e = next((f.expr for f in table.fields if f.name == n), None)
            if e is None:
                # reference expr/field.go:44-47: a field missing from the
                # table reads as ABSENT (value 0, ok=false) — comparisons
                # against it are false, nothing errors (the integration
                # test's `HAVING ... OR unknown = 12`). The Spark analogue
                # of "absent" is a typed NULL: NULL = 12 is not-true in a
                # filter, and NULL propagates through arithmetic.
                return MConst(None)
            if isinstance(e, MFieldRef):
                return MAgg("SUM", e, None)
            return e

        # a SELECTed name that is an output dim is a dim passthrough (the
        # reference's IN-subqueries SELECT the dim they feed — sql/sql.go:1054)
        dim_names = {n for n, _ in out_dims}
        fields = [
            f
            for f in fields
            if not (isinstance(f.expr, MFieldRef) and f.expr.name in dim_names)
        ]

        # ORDER BY may reference a field OUTSIDE the SELECT list (reference
        # sql_test.go's `ORDER BY Rate DESC, x, y`): materialize it as a
        # hidden `__ob_<name>` column the sort consumes and then drops.
        # Unknown names resolve to the absent-field NULL constant. Crosstab
        # pivots every field, so hidden columns stay off that path.
        if q.order_by and not q.crosstab:
            produced = {f.name for f in fields} | {n for n, _ in out_dims} | {"_time"}
            for name, _desc in q.order_by:
                if name not in produced:
                    fields.append(SelectField(f"__ob_{name}", MFieldRef(name)))

        # rewrite fields; find required leaves (possibly IF-gated at query time)
        rewritten: list[SelectField] = []
        leaves: list[MExpr] = []
        for f in fields:
            rewritten.append(SelectField(f.name, collect_agg_leaves(f.expr, field_lookup, leaves)))
            if not isinstance(f.expr, MFieldRef):
                query_aliases[f.name] = f.expr
        having_expr = None
        if q.having is not None:
            having_expr = collect_agg_leaves(q.having, field_lookup, leaves)

        # map query leaves onto stored states; build gates + a merged registry
        qreg = StateRegistry()
        gates: dict[str, object] = {}
        rename: dict[str, str] = {}  # stored col -> merged col
        points_key = agg_key(MAgg("SUM", MFieldRef("_point"), None))
        for leaf in leaves:
            k = agg_key(leaf)
            if k in qreg.specs:
                continue
            # progressively strip query-time IF gates until the remaining
            # expression matches a stored state (a table-def IF is part of
            # the stored key; a query-time IF becomes a merge gate)
            gate_cond = None
            inner = leaf
            while agg_key(inner) not in registry.specs and isinstance(inner, MIf):
                c = compile_dim(inner.cond)
                gate_cond = c if gate_cond is None else gate_cond & c
                inner = inner.inner
            if isinstance(inner, MPresence):
                ik = points_key
            else:
                ik = agg_key(inner)
            if ik not in registry.specs:
                raise ValueError(
                    f"query aggregate {inner!r} does not match any stored field of "
                    f"{table.tdef.name} (stored aggregates cannot be re-aggregated "
                    f"with a different function)"
                )
            stored = registry.specs[ik]
            qspecs = []
            for s_i, s in enumerate(stored):
                col = s.col if gate_cond is None else f"_g{len(qreg.specs)}_{s_i}__{s.merge}"
                qspecs.append(C.StateSpec(k, col, s.merge, s.hist_meta))
            qreg.specs[k] = qspecs
            qreg._agg_exprs[k] = leaf
            if gate_cond is not None:
                for s, qs in zip(stored, qspecs):
                    state = state.withColumn(qs.col, F.when(dim_truth(gate_cond), F.col(s.col)))

        merged = merge_states(
            state,
            qreg,
            [(n, c) for n, c in out_dims],
            table.resolution,
            res_out if not q.stride else max(res_out, q.stride),
            anchor=bucket_anchor,
        )

        def q_lookup(n: str) -> MExpr:
            return collect_agg_leaves(field_lookup(n), field_lookup, [])

        # crosstab: re-plan with the crosstab expr as an extra dim, then pivot
        if q.crosstab:
            return self._crosstab(
                q, table, state, qreg, out_dims, res_out, rewritten, having_expr,
                q_lookup, out_min_ts=out_min_ts, anchor=bucket_anchor,
            )

        flat = self._finalize_flat(
            merged, qreg, rewritten, out_dims, q_lookup, res_out, having=having_expr
        )
        if out_min_ts is not None:
            flat = flat.filter(
                F.col(TIME_COL) >= F.timestamp_seconds(F.lit(out_min_ts))
            )
        if having_expr is not None:
            flat = flat.filter(F.col("_having") > 0).drop("_having")
        return self._order_limit(flat, q)

    def _finalize_flat(
        self, merged, qreg, fields, out_dims, q_lookup, res_out, having=None
    ) -> DataFrame:
        """Finalize merged states into flat field values. SHIFT may appear
        ANYWHERE in a field/HAVING expression (the reference treats a
        shifted expr as an ordinary field — expr/shift.go): every distinct
        SHIFT node is materialized once as a hidden column via the
        (dims, bucket − dur) self-join, then expressions compile with those
        nodes resolved to the joined columns. CROSSHIFT stays a
        select-level macro expanding to one column per offset."""
        dims = [n for n, _ in out_dims]

        # 1. discover every distinct SHIFT node (anywhere) + expand CROSSHIFT
        shift_cols: dict[MShift, str] = {}
        shift_plans: list[tuple[str, float, Column]] = []  # hidden, dur, base

        def register(node: MShift) -> str:
            if node not in shift_cols:
                name = f"__sh{len(shift_cols)}"
                shift_cols[node] = name
                shift_plans.append(
                    (name, node.dur, finalize_expr(node.inner, qreg, q_lookup))
                )
            return shift_cols[node]

        def walk(e) -> None:
            import dataclasses

            if isinstance(e, MShift):
                register(e)
                return  # inner belongs to the shift's own finalize
            if isinstance(e, MCrosshift):
                return  # select-level macro, handled per-field below
            if dataclasses.is_dataclass(e) and not isinstance(e, type):
                for fld in dataclasses.fields(e):
                    v = getattr(e, fld.name)
                    if isinstance(v, MExpr):
                        walk(v)

        crosshift_outs: list[tuple[str, str]] = []  # (hidden/base col, out name)
        plain_fields: list = []
        for f in fields:
            e = f.expr
            if isinstance(e, MCrosshift):
                off = e.interval
                while off <= e.cutoff:
                    crosshift_outs.append(
                        (register(MShift(e.inner, off)), f"{f.name}_{format_duration(off)}")
                    )
                    off += e.interval
                plain_fields.append((f.name, e.inner))  # offset-0 base column
            else:
                walk(e)
                plain_fields.append((f.name, e))
        if having is not None:
            walk(having)

        # 2. base frame: merged state + one column per distinct shift node
        flat = merged
        for hidname, _dur, base in shift_plans:
            flat = flat.withColumn(f"{hidname}_base", base)
        # 3. shift joins: every hidden column comes off the SAME base frame
        #    (no cascading self-joins), keyed (dims, bucket − dur)
        for hidname, dur, _base in shift_plans:
            n = int(dur // res_out * res_out)
            sh = flat.select(
                *dims,
                (F.col(BUCKET_COL) + F.lit(n)).alias(BUCKET_COL),
                F.col(f"{hidname}_base").alias(hidname),
            )
            flat = flat.join(sh, on=[*dims, BUCKET_COL], how="left")

        # 4. final projection: fields/having compile with shift nodes
        #    resolved to the joined columns
        cols: list = [F.timestamp_seconds(F.col(BUCKET_COL)).alias(TIME_COL)] + [
            F.col(d) for d in dims
        ]
        if having is not None:
            cols.append(
                finalize_expr(having, qreg, q_lookup, shift_cols).alias("_having")
            )
        for name, e in plain_fields:
            cols.append(finalize_expr(e, qreg, q_lookup, shift_cols).alias(name))
        for hidname, out_name in crosshift_outs:
            cols.append(F.coalesce(F.col(hidname), F.lit(0.0)).alias(out_name))
        return flat.select(*cols, F.col(BUCKET_COL)).drop(BUCKET_COL)

    def _crosstab(
        self, q, table, state, qreg, out_dims, res_out, fields, having_expr,
        q_lookup, out_min_ts=None, anchor=0,
    ):
        ct_resolve = lambda n: F.col(n) if n in state.columns else F.lit(None)
        ct_col = F.concat_ws(
            "_", *[compile_dim(e, ct_resolve).cast("string") for e in q.crosstab]
        )
        dims_ct = list(out_dims) + [("__ct", ct_col)]
        merged_ct = merge_states(
            state, qreg, dims_ct, table.resolution, res_out, anchor=anchor
        )
        flat_ct = self._finalize_flat(merged_ct, qreg, fields, dims_ct, q_lookup, res_out)
        if out_min_ts is not None:
            # trim the shift-extended read BEFORE the pivot-value collection,
            # so pre-ASOF-only crosstab values never become phantom columns
            flat_ct = flat_ct.filter(
                F.col(TIME_COL) >= F.timestamp_seconds(F.lit(out_min_ts))
            )
        # Pivot needs the distinct column values on the driver (the same
        # two-pass shape as Spark's own pivot(); the reference buffers rows
        # too) — but guard the cardinality so a runaway crosstab dim fails
        # loudly instead of OOMing the driver.
        cap = self.crosstab_max_values
        distinct_rows = (
            flat_ct.select("__ct").distinct().limit(cap + 1).collect()
        )
        if len(distinct_rows) > cap:
            raise ValueError(
                f"CROSSTAB dimension has more than {cap} distinct values; "
                "raise DB(crosstab_max_values=...) if this is intentional"
            )
        values = sorted(r["__ct"] for r in distinct_rows if r["__ct"] is not None)
        dims = [n for n, _ in out_dims]
        pivoted = (
            flat_ct.groupBy(TIME_COL, *dims)
            .pivot("__ct", values)
            .agg(*[F.first(f.name).alias(f.name) for f in fields])
        )
        if len(fields) == 1:
            for v in values:
                if v in pivoted.columns:
                    pivoted = pivoted.withColumnRenamed(v, f"{v}_{fields[0].name}")
        # totals + HAVING computed on the un-pivoted (dims, bucket) grain
        merged_tot = merge_states(
            state, qreg, out_dims, table.resolution, res_out, anchor=anchor
        )
        tot_fields = [SelectField(f"total_{f.name}", f.expr) for f in fields]
        flat_tot = self._finalize_flat(
            merged_tot, qreg, tot_fields, out_dims, q_lookup, res_out, having=having_expr
        )
        if out_min_ts is not None:
            flat_tot = flat_tot.filter(
                F.col(TIME_COL) >= F.timestamp_seconds(F.lit(out_min_ts))
            )
        if having_expr is not None:
            flat_tot = flat_tot.filter(F.col("_having") > 0).drop("_having")
        join_cols = [TIME_COL, *dims]
        if q.crosstab_totals:
            out = pivoted.join(flat_tot, on=join_cols, how="inner")
        else:
            out = pivoted.join(flat_tot.select(*join_cols), on=join_cols, how="inner")
        return self._order_limit(out, q)

    # -- query over a flat (subquery) source ---------------------------------
    def _flat_fields(self, inner_q: Query) -> list[str]:
        return [f.name for f in inner_q.fields]

    def _aggregate_flat(self, q: Query, inner: DataFrame, inner_fields: list[str]) -> DataFrame:
        """Outer query over a FROM-subquery: the inner flat rows act as raw
        points (ts = inner _time, dims = inner dims, vals = inner fields) —
        the reference's Unflatten→Group path (core/unflatten.go)."""
        inner_dims = [c for c in inner.columns if c not in inner_fields and c != TIME_COL]
        fields = list(q.fields)
        if q.select_star or not fields:
            seen = {f.name for f in fields}
            fields += [SelectField(n, MFieldRef(n)) for n in inner_fields if n not in seen]
        resolve = lambda n: F.col(n) if n in inner.columns else F.lit(None)
        df = self._apply_where(inner, q.where, resolve)
        if q.group_by_none:
            group_dims: list[tuple[str, object]] = []
        elif q.group_by_all or not q.group_by:
            group_dims = [(d, F.col(d)) for d in inner_dims]
        else:
            resolve = lambda n: F.col(n) if n in df.columns else F.lit(None)
            group_dims = [(g.name, compile_dim(g.expr, resolve)) for g in q.group_by]
        res = q.resolution or 1.0
        state, registry = aggregate_raw(df, fields, group_dims, res, TIME_COL)

        def f_lookup(n: str) -> MExpr:
            for f in fields:
                if f.name == n and not isinstance(f.expr, MFieldRef):
                    return f.expr
            return MAgg("SUM", MFieldRef(n), None)

        rewritten = [
            SelectField(f.name, collect_agg_leaves(f.expr, f_lookup, [])) for f in fields
        ]
        flat = self._finalize_flat(state, registry, rewritten, group_dims, f_lookup, res)
        if q.having is not None:
            h = collect_agg_leaves(q.having, f_lookup, [])
            flat = flat.withColumn("_having", finalize_expr(h, registry, f_lookup))
            flat = flat.filter(F.col("_having") > 0).drop("_having")
        return self._order_limit(flat, q)

    # -- shared tail ----------------------------------------------------------
    def _resolve_in_subqueries(
        self, e: DimExpr | None, joins: list | None = None
    ) -> DimExpr | None:
        """Plan uncorrelated IN-subqueries (reference planner/subquery.go:13–100;
        the subquery must select exactly one dim).

        Scale-safe two-tier strategy: the subquery's distinct dim values are
        fetched with LIMIT (in_splice_max + 1). Small sets splice into the
        predicate as a value list (the reference's design — cheap, pushes to
        the scan). Larger sets never touch the driver: the planner records a
        (marker, values_df, dim_expr) join spec and the caller left-joins the
        distinct values (AQE broadcasts when they fit), so the predicate
        compiles to a null-check on the marker — valid under NOT/OR too.
        """
        if e is None:
            return None
        if isinstance(e, DimInSubquery):
            sub = e.subquery
            if len(sub.fields) != 1 and not sub.group_by:
                raise ValueError("IN-subquery must select exactly one dimension")
            sub_df = self.plan(sub)
            dim_name = (
                sub.group_by[0].name
                if sub.group_by
                else sub.fields[0].name
            )
            vals_df = sub_df.select(dim_name).filter(F.col(dim_name).isNotNull()).distinct()
            head = vals_df.limit(self.in_splice_max + 1).collect()
            if len(head) <= self.in_splice_max or joins is None:
                values = tuple(r[dim_name] for r in head)
                return DimIn(e.inner, values or (None,))
            marker = f"__in_sq_{len(joins)}"
            joins.append((marker, vals_df.withColumnRenamed(dim_name, marker), e.inner))
            return DimMarker(marker)
        if isinstance(e, DimLogical):
            return DimLogical(
                e.op,
                self._resolve_in_subqueries(e.left, joins),
                self._resolve_in_subqueries(e.right, joins),
            )
        if isinstance(e, DimNot):
            return DimNot(self._resolve_in_subqueries(e.inner, joins))
        return e

    def _apply_where(self, df: DataFrame, where: DimExpr | None, resolve=None) -> DataFrame:
        """Resolve IN-subqueries in ``where`` and filter ``df``: small value
        sets splice inline; large ones become membership left-joins on the
        subquery's distinct values (no driver collect)."""
        where = self._resolve_in_subqueries(where, joins := [])
        if where is None:
            return df
        for marker, vals_df, inner_dim in joins:
            key = compile_dim(inner_dim, resolve) if resolve else compile_dim(inner_dim)
            df = df.join(vals_df, key == vals_df[marker], "left")
        df = df.filter(dim_truth(compile_dim(where, resolve) if resolve else compile_dim(where)))
        if joins:
            df = df.drop(*[m for m, _, _ in joins])
        return df

    def _order_limit(self, df: DataFrame, q: Query) -> DataFrame:
        drop_after = []
        if q.order_by:
            cols = []
            for name, desc in q.order_by:
                # ORDER BY references an output name, a non-selected field
                # materialized as a hidden `__ob_<name>` column by the
                # table-query path (reference sql_test.go orders by fields
                # outside the SELECT list), or — failing both — an unknown
                # name, which reads as ABSENT and sorts as a constant
                # (expr/field.go:44-47's nil rule; a no-op sort key)
                if name == "_time":
                    c = F.col(TIME_COL)
                elif name in df.columns:
                    c = F.col(name)
                elif f"__ob_{name}" in df.columns:
                    c = F.col(f"__ob_{name}")
                else:
                    c = F.lit(None).cast("double")
                cols.append(c.desc() if desc else c.asc())
            df = df.orderBy(*cols)
        if q.offset:
            df = df.offset(q.offset)
        if q.limit is not None:
            df = df.limit(q.limit)
        return df.drop(*[c for c in df.columns if c.startswith("__ob_")])


def _substitute_refs(e: MExpr, by_name: dict[str, MExpr]) -> MExpr:
    """Inline parent field definitions into a view's expressions (reference
    table.go:194–250: views derive from the parent's field exprs)."""
    if isinstance(e, MFieldRef):
        return by_name.get(e.name, e)
    if isinstance(e, MBin):
        return MBin(e.op, _substitute_refs(e.left, by_name), _substitute_refs(e.right, by_name))
    if isinstance(e, MIf):
        return MIf(e.cond, _substitute_refs(e.inner, by_name))
    if isinstance(e, MShift):
        return MShift(_substitute_refs(e.inner, by_name), e.dur)
    if isinstance(e, MCrosshift):
        return MCrosshift(_substitute_refs(e.inner, by_name), e.cutoff, e.interval)
    return e


def _parse_simple_yaml(text: str) -> dict:
    """Minimal YAML subset parser for schema files (no external deps):
    two-level mapping with scalar values, `>`/`|` block strings, and simple
    inline lists."""
    out: dict[str, dict] = {}
    cur: dict | None = None
    block_key: str | None = None
    block_lines: list[str] = []
    block_indent = 0
    for raw in text.splitlines():
        line = raw.rstrip("\n")
        if block_key is not None:
            if not line.strip() or (len(line) - len(line.lstrip())) >= block_indent:
                block_lines.append(line.strip())
                continue
            cur[block_key] = " ".join(l for l in block_lines if l)
            block_key = None
        if not line.strip() or line.lstrip().startswith("#"):
            continue
        indent = len(line) - len(line.lstrip())
        key, _, val = line.strip().partition(":")
        val = val.strip()
        if indent == 0:
            cur = {}
            out[key] = cur
        else:
            if val in (">", "|"):
                block_key = key
                block_lines = []
                block_indent = indent + 1
            elif val.startswith("["):
                cur[key] = [v.strip() for v in val.strip("[]").split(",") if v.strip()]
            elif val.lower() in ("true", "false"):
                cur[key] = val.lower() == "true"
            else:
                cur[key] = val
    if block_key is not None and cur is not None:
        cur[block_key] = " ".join(l for l in block_lines if l)
    return out
