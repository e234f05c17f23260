"""Parser → IR snapshot tests, modeled on the reference's sql/sql_test.go
corpus query (sql_test.go:48–104)."""

from __future__ import annotations

import pytest

from zenodb_spark.ir import (
    DimCompare,
    DimConst,
    DimFunc,
    DimIn,
    DimInSubquery,
    DimIsNull,
    DimLike,
    DimLogical,
    DimRef,
    MAgg,
    MBin,
    MBounded,
    MConst,
    MCrosshift,
    MFieldRef,
    MIf,
    MLog,
    MPercentile,
    MPresence,
    MShift,
)
from zenodb_spark.sqlparser.parser import parse

CORPUS = """
SELECT -- force_fresh
\tAVG(a) / (SUM(A) + SUM(b) + SUM(C)) * 2 AS rate,
\tmyfield,
\t`knownfield`,
\tIF(dim = 'test', AVG(myfield)) AS the_avg,
\t*,
\tSUM(BOUNDED(bfield, 0, 100)) AS bounded,
\t5 as cval,
\tWAVG(a, b) AS weighted,
\tIF(dim = 'test2', _) AS present,
\tSHIFT(SUM(s), '1h') AS shifted,
\tCROSSHIFT(cs, '-1w', '1d'),
\tLN(l) AS log1,
\tLOG2(l) AS log2,
\tLOG10(l) AS log3,
\tSUM(p) AS p,
\tPERCENTILE(ptile, 1, 0, 0, 1) AS ptile2,
\tPERCENTILE(ptile, 2) AS ptile2_opt
FROM Table_A ASOF '-1w' UNTIL '-15m'
WHERE
\tDim_a LIKE '172.56.' AND
\tdim_b > 10 OR (dim_c = 20 OR dim_d <> 'thing') AND
\tdim_e NOT LIKE 'no such host' AND
\tdim_f != true AND
\tdim_g IS NULL AND
\tdim_h IS NOT NULL AND
\tdim_i IN (5, 6, 7, 8) AND
\tRAND() < 0.5
GROUP BY
\tdim_a,
\tCROSSTABT(dim_b, dim_ct),
\tPCONCAT('|', part_a, part_b) AS joined,
\tSPLIT(dim_o, ',', 2) AS spl,
\tPSUBSTR(dim_p, 1, 5) AS sub,
\tLEN(dim_q) AS qlen,
\tREPLACEALL(dim_r, 'regex', 'replacement') AS replaced,
\tDECODE(dim_q, 1, 'ok', 'default') AS decoded,
\tperiod('5s'),
\tSTRIDE('1d')
HAVING Rate > 15 AND H < 2
ORDER BY Rate DESC, x, y
LIMIT 100, 10
"""


def test_corpus_query():
    q = parse(CORPUS)
    assert q.force_fresh
    names = [f.name for f in q.fields]
    assert names == [
        "rate", "myfield", "knownfield", "the_avg", "bounded", "cval",
        "weighted", "present", "shifted", "cs", "log1", "log2", "log3", "p",
        "ptile2", "ptile2_opt",
    ]
    assert q.select_star
    rate = q.fields[0].expr
    assert rate == MBin(
        "*",
        MBin(
            "/",
            MAgg("AVG", MFieldRef("a"), None),
            MBin(
                "+",
                MBin("+", MAgg("SUM", MFieldRef("a"), None), MAgg("SUM", MFieldRef("b"), None)),
                MAgg("SUM", MFieldRef("c"), None),
            ),
        ),
        MConst(2.0),
    )
    assert q.fields[3].expr == MIf(
        DimCompare("=", DimRef("dim"), DimConst("test")),
        MAgg("AVG", MFieldRef("myfield"), None),
    )
    assert q.fields[4].expr == MAgg("SUM", MBounded(MFieldRef("bfield"), 0.0, 100.0), None)
    assert q.fields[5].expr == MConst(5.0)
    assert q.fields[6].expr == MAgg("WAVG", MFieldRef("a"), MFieldRef("b"))
    assert q.fields[7].expr == MIf(DimCompare("=", DimRef("dim"), DimConst("test2")), MPresence())
    assert q.fields[8].expr == MShift(MAgg("SUM", MFieldRef("s"), None), 3600.0)
    assert q.fields[9].expr == MCrosshift(MFieldRef("cs"), 7 * 86400.0, 86400.0)
    assert q.fields[10].expr == MLog("LN", MFieldRef("l"))
    assert q.fields[14].expr == MPercentile(MFieldRef("ptile"), 1.0, 0.0, 0.0, 1)
    assert q.fields[15].expr == MPercentile(MFieldRef("ptile"), 2.0)

    assert q.from_table == "table_a"
    assert q.asof == "-1w" and q.until == "-15m"

    # where: top-level OR (AND binds tighter)
    assert isinstance(q.where, DimLogical) and q.where.op == "OR"
    left = q.where.left
    assert left == DimLogical(
        "AND",
        DimLike(DimRef("dim_a"), "172.56.", False),
        DimCompare(">", DimRef("dim_b"), DimConst(10)),
    )

    # group by
    assert [g.name for g in q.group_by] == [
        "dim_a", "joined", "spl", "sub", "qlen", "replaced", "decoded",
    ]
    assert q.group_by[1].expr == DimFunc(
        "CONCAT", (DimConst("|"), DimRef("part_a"), DimRef("part_b"))
    )
    assert q.group_by[2].expr == DimFunc("SPLIT", (DimRef("dim_o"), DimConst(","), DimConst(2)))
    assert q.crosstab == [DimRef("dim_b"), DimRef("dim_ct")]
    assert q.crosstab_totals
    assert q.resolution == 5.0
    assert q.stride == 86400.0

    assert q.having == MBin(
        "AND",
        MBin(">", MFieldRef("rate"), MConst(15.0)),
        MBin("<", MFieldRef("h"), MConst(2.0)),
    )
    assert q.order_by == [("rate", True), ("x", False), ("y", False)]
    assert q.offset == 100 and q.limit == 10


def test_in_subquery_and_from_subquery():
    q = parse(
        "SELECT name, * FROM (SELECT a FROM the_table ASOF '-2h' UNTIL '-1h' "
        "GROUP BY CONCAT(',', A, B) AS A, period('5s') HAVING stuff > 5) "
        "WHERE x IN (SELECT subdim FROM subtable WHERE subdim > 20)"
    )
    assert q.from_subquery is not None
    sub = q.from_subquery
    assert sub.asof == "-2h" and sub.until == "-1h" and sub.resolution == 5.0
    assert isinstance(q.where, DimInSubquery)
    assert q.where.subquery.from_table == "subtable"


def test_group_by_underscore_and_defaults():
    q = parse("SELECT x FROM t GROUP BY _, period('1s')")
    assert q.group_by_none and not q.group_by and q.resolution == 1.0
    q2 = parse("SELECT x FROM t")
    assert q2.group_by_all
    q3 = parse("SELECT x FROM t GROUP BY period('10s')")
    assert q3.group_by_all and q3.resolution == 10.0


def test_errors():
    with pytest.raises(SyntaxError):
        parse("SELECT a + b FROM t")  # expression needs AS name
    with pytest.raises(SyntaxError):
        parse("SELECT x FROM t GROUP BY CONCAT('|', a, b)")  # dim expr needs AS
