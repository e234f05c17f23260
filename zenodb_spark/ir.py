"""Query IR — a dataclass mirror of the reference's sql.Query
(reference sql/sql.go:161–195) with expression ASTs for both sides of the
dialect:

- *dimension expressions* (WHERE / GROUP BY keys) — the goexpr surface;
- *measure expressions* (SELECT fields / HAVING) — the expr.Expr surface,
  where every leaf is an aggregate (default-to-SUM) and everything above is
  post-aggregation arithmetic.

The IR is engine-agnostic; plans/compiler.py lowers it to DataFrame ops.
"""

from __future__ import annotations

from dataclasses import dataclass, field


# --------------------------------------------------------------------------
# dimension expressions (reference: goexpr via sql/sql.go:989–1120)
# --------------------------------------------------------------------------


class DimExpr:
    pass


@dataclass(frozen=True)
class DimRef(DimExpr):
    name: str


@dataclass(frozen=True)
class DimConst(DimExpr):
    value: object  # str | int | float | bool | None


@dataclass(frozen=True)
class DimFunc(DimExpr):
    name: str  # CONCAT/SPLIT/SUBSTR/REPLACEALL/LEN/ANY/ARRAY/DECODE/RAND/registered
    args: tuple


@dataclass(frozen=True)
class DimCompare(DimExpr):
    op: str  # = <> < <= > >=
    left: DimExpr
    right: DimExpr


@dataclass(frozen=True)
class DimLogical(DimExpr):
    op: str  # AND | OR
    left: DimExpr
    right: DimExpr


@dataclass(frozen=True)
class DimNot(DimExpr):
    inner: DimExpr


@dataclass(frozen=True)
class DimIsNull(DimExpr):
    inner: DimExpr
    negated: bool


@dataclass(frozen=True)
class DimLike(DimExpr):
    inner: DimExpr
    pattern: str
    negated: bool


@dataclass(frozen=True)
class DimIn(DimExpr):
    inner: DimExpr
    values: tuple


@dataclass(frozen=True)
class DimInSubquery(DimExpr):
    inner: DimExpr
    subquery: "Query"


@dataclass(frozen=True)
class DimMarker(DimExpr):
    """Planner-internal: membership flag column left by an IN-subquery
    semi-join (non-null ⇒ the dim value was in the subquery result)."""

    col: str


# --------------------------------------------------------------------------
# measure expressions (reference: expr/ package via sql/sql.go:690–898)
# --------------------------------------------------------------------------


class MExpr:
    pass


@dataclass(frozen=True)
class MConst(MExpr):
    value: float


@dataclass(frozen=True)
class MFieldRef(MExpr):
    """Bare reference to a column/known field — default-to-SUM semantics
    resolved at bind time (reference sql/sql.go:727–737)."""

    name: str


@dataclass(frozen=True)
class MAgg(MExpr):
    kind: str  # SUM MIN MAX COUNT AVG WAVG
    arg: MExpr
    weight: MExpr | None = None  # WAVG only


@dataclass(frozen=True)
class MIf(MExpr):
    cond: DimExpr  # TRUE = TRUE allowed
    inner: MExpr


@dataclass(frozen=True)
class MBounded(MExpr):
    inner: MExpr
    lo: float
    hi: float


@dataclass(frozen=True)
class MPercentile(MExpr):
    inner: MExpr
    p: float
    lo: float | None = None
    hi: float | None = None
    precision: int | None = None  # None → 2-arg re-read form


@dataclass(frozen=True)
class MShift(MExpr):
    inner: MExpr
    dur: float  # seconds


@dataclass(frozen=True)
class MCrosshift(MExpr):
    inner: MExpr
    cutoff: float  # seconds (may be negative in SQL; stored absolute)
    interval: float


@dataclass(frozen=True)
class MLog(MExpr):
    kind: str  # LN LOG2 LOG10
    inner: MExpr


@dataclass(frozen=True)
class MBin(MExpr):
    op: str  # + - * / < <= > >= = <> AND OR
    left: MExpr
    right: MExpr


@dataclass(frozen=True)
class MPresence(MExpr):
    """The `_` magic column: 1 when any point present (GT(SUM(_point),0) —
    reference sql/sql.go:722–725)."""


# --------------------------------------------------------------------------
# query
# --------------------------------------------------------------------------


@dataclass(frozen=True)
class SelectField:
    name: str
    expr: MExpr


@dataclass(frozen=True)
class GroupDim:
    name: str
    expr: DimExpr


@dataclass
class Query:
    fields: list[SelectField] = field(default_factory=list)
    select_star: bool = False
    from_table: str | None = None
    from_subquery: "Query | None" = None
    from_sql: str | None = None  # original text of subquery (fidelity)
    where: DimExpr | None = None
    asof: str | None = None  # RFC3339 or signed duration
    until: str | None = None
    group_by: list[GroupDim] = field(default_factory=list)
    group_by_all: bool = False  # GROUP BY * (or no GROUP BY)
    group_by_none: bool = False  # GROUP BY _
    resolution: float | None = None  # period(d) seconds
    stride: float | None = None  # stride(d) seconds
    crosstab: list[DimExpr] = field(default_factory=list)
    crosstab_totals: bool = False
    having: MExpr | None = None
    order_by: list[tuple[str, bool]] = field(default_factory=list)  # (name, desc)
    offset: int | None = None
    limit: int | None = None
    force_fresh: bool = False


@dataclass
class SetOp:
    """Set operation between two dialect queries (beyond the reference —
    SURVEY §2.6 notes the reference has none and Spark provides them for
    free). ``op`` ∈ {union, union_all, intersect, intersect_all, except,
    except_all}; UNION/INTERSECT/EXCEPT follow ANSI bag→set semantics
    (result deduplicated), the *_all forms keep duplicates."""

    op: str
    left: "Query | SetOp"
    right: "Query | SetOp"
    force_fresh: bool = False
    # trailing ORDER BY / LIMIT apply to the combined result (ANSI): the
    # parser lifts them off the last operand onto the chain's root
    order_by: list[tuple[str, bool]] = field(default_factory=list)
    offset: int | None = None
    limit: int | None = None
