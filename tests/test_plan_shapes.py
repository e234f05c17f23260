"""Plan-shape regression tests: assert the PHYSICAL plans of the scale-
critical operators keep the properties the 100 TB design depends on —
exchange counts, broadcast direction, pushed filters. These catch silent
plan regressions (a lost broadcast hint, a filter that stops pushing, an
extra shuffle) that row-level oracles can never see.
"""

from __future__ import annotations

import re

from pyspark.sql import Row, functions as F

from zenodb_spark.operators import timeops

SF_DIR = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_asof_join_single_shuffle_no_join(spark):
    """asof_join must be union + window over ONE key exchange — the whole
    point vs. a range join. No Join node, no second hash exchange before
    the window."""
    left = spark.createDataFrame([Row(k=1, t=10), Row(k=1, t=20)])
    right = spark.createDataFrame([Row(k=1, t=5), Row(k=1, t=15)])
    out = timeops.asof_join(left, right, ("k",), "t")
    plan = _plan(out)
    assert "Join" not in plan
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1
    assert len(re.findall(r"\bWindow\b", plan)) == 1
    rows = {r.t: r.asof_t for r in out.collect()}
    assert rows == {10: 5, 20: 15}


def test_asof_join_strict_vs_inclusive_ties(spark):
    left = spark.createDataFrame([Row(k=1, t=10)])
    right = spark.createDataFrame([Row(k=1, t=10)])
    strict = timeops.asof_join(left, right, ("k",), "t", strict=True)
    assert strict.collect()[0].asof_t is None
    incl = timeops.asof_join(left, right, ("k",), "t", strict=False)
    assert incl.collect()[0].asof_t == 10


def test_q54_pushes_event_type_filter_to_scan(spark):
    from zenodb_spark import queries as Q

    plan = _plan(Q.QUERIES["q54_asof_attribution"](spark, SF_DIR))
    assert "In(event_type, [click,purchase])" in plan
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 2


def test_q56_broadcasts_dims_not_fact(spark):
    """Star join: both dimension joins must be broadcast — an orders-side
    broadcast (the r1 q35 bug class) or a shuffle join here would be a
    scale regression."""
    from zenodb_spark import queries as Q

    plan = _plan(Q.QUERIES["q56_running_revenue"](spark, SF_DIR))
    assert len(re.findall(r"BroadcastHashJoin", plan)) == 2
    # the fact table never feeds a BroadcastExchange: every broadcast
    # input reads only dimension columns
    for bc in re.findall(r"BroadcastExchange[^\n]*", plan):
        assert "o_totalprice" not in bc
    assert "SortMergeJoin" not in plan


def test_connected_components_persisted_edges_prehashed(spark):
    """The symmetric edge list must carry hashpartitioning(src) into the
    cache so propagation rounds reuse it exchange-free."""
    from zenodb_spark.operators.dedup import connected_components

    edges = spark.createDataFrame(
        [Row(doc_a=1, doc_b=2), Row(doc_a=2, doc_b=3), Row(doc_a=10, doc_b=11)]
    )
    labels = connected_components(edges)
    got = {r.node: r.lab for r in labels.collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_q55_partial_aggregation_before_shuffle(spark):
    """count_distinct must plan as expand + two-phase agg (partial_count /
    partial aggregation below the exchange), not a naive global distinct."""
    from zenodb_spark import queries as Q

    plan = _plan(Q.QUERIES["q55_distinct_users"](spark, SF_DIR))
    # the distinct rewrite dedups (dims, user_id) in a partial aggregate
    # below the exchange — map-side combine still applies
    assert re.search(r"HashAggregate\(keys=\[[^\]]*user_id[^\]]*\]", plan)
    assert plan.count("HashAggregate") >= 3


def test_asof_join_matches_bruteforce(spark):
    """Property check: asof_join == per-row brute force on a deterministic
    grid of (key, ts) layouts, including duplicate timestamps on both
    sides, keys with no right rows, and payload carry."""
    import itertools

    lrows = [(k, t) for k, t in itertools.product([1, 2, 3], [5, 10, 10, 20])]
    rrows = [(1, 1), (1, 10), (1, 15), (2, 20), (2, 20), (4, 7)]
    left = spark.createDataFrame([Row(k=k, t=t) for k, t in lrows])
    right = spark.createDataFrame(
        [Row(k=k, t=t, pay=k * 100 + t) for k, t in rrows]
    )
    for strict in (True, False):
        out = timeops.asof_join(left, right, ("k",), "t", payload=("pay",), strict=strict)
        got = sorted((r.k, r.t, r.asof_t, r.asof_pay) for r in out.collect())
        expect = []
        for k, t in lrows:
            cand = [
                (rt, pay)
                for (rk, rt, pay) in [(r[0], r[1], r[0] * 100 + r[1]) for r in rrows]
                if rk == k and (rt < t if strict else rt <= t)
            ]
            best = max(cand) if cand else (None, None)
            expect.append((k, t, best[0], best[1]))
        assert got == sorted(expect)


def test_q199_profile_single_expand_no_rescan(spark):
    """The column profile's six exact count-distincts must plan as ONE
    Expand over ONE scan — six separate distinct-aggregate jobs (or six
    scans) would re-read the table per column at 100 TB."""
    from zenodb_spark import queries as Q

    plan = _plan(Q.QUERIES["q199_data_profile"](spark, SF_DIR))
    assert len(re.findall(r"\bExpand\b", plan)) == 1
    assert len(re.findall(r"Scan parquet", plan)) == 1


def test_ks_grid_is_broadcast_cross(spark):
    """ks_distance_by_group's CDF grid must be a BroadcastNestedLoopJoin of
    two aggregates (groups × distinct values) — a shuffled cartesian here
    would materialize corpus-scale intermediate state; and the raw frame
    must be scanned a bounded number of times, never per-group."""
    from pyspark.sql import Row

    from zenodb_spark.operators.stats import ks_distance_by_group

    df = spark.createDataFrame([Row(g="a", x=1), Row(g="b", x=2)])
    plan = _plan(ks_distance_by_group(df, "g", "x"))
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan


def test_chi2_grid_is_broadcast_cross(spark):
    from pyspark.sql import Row

    from zenodb_spark.operators.stats import chi2_contingency

    df = spark.createDataFrame([Row(g="a", c="x"), Row(g="b", c="y")])
    plan = _plan(chi2_contingency(df, "g", "c"))
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan


def _broadcast_subtrees(plan: str) -> list[str]:
    """Carve each BroadcastExchange's subtree out of a toString() plan by
    tree-prefix depth (the char offset of its node marker)."""
    lines = plan.splitlines()
    subs = []
    for i, line in enumerate(lines):
        m = re.search(r"[+:]- BroadcastExchange", line)
        if not m and not line.startswith("BroadcastExchange"):
            continue
        depth = m.start() if m else 0
        block = [line]
        for nxt in lines[i + 1 :]:
            m2 = re.search(r"[+:]- ", nxt)
            if m2 is None or m2.start() > depth:
                block.append(nxt)
            else:
                break
        subs.append("\n".join(block))
    return subs


def test_q221_fact_never_broadcast(spark):
    """q221 (TPC-H Q2 shape): part/supplier carry NO broadcast hint (AQE
    and size stats decide — SCALE.md policy for SF-scaled sides), and no
    plan choice may ever put lineitem fact columns in a broadcast build.
    The window must rank on the aggregate, not the raw fact."""
    from zenodb_spark import queries as Q

    plan = _plan(Q.QUERIES["q221_min_cost_supplier"](spark, SF_DIR))
    for sub in _broadcast_subtrees(plan):
        assert "l_extendedprice" not in sub and "l_quantity" not in sub
    # rank window consumes the (part, supp) aggregate: the plan prints
    # top-down, so the Window line precedes its HashAggregate child
    assert re.search(r"Window \[row_number", plan)
    assert plan.index("Window [row_number") < plan.index("HashAggregate(keys=[l_partkey")
    # rk == 1 must push down as a group-limit with a map-side Partial pass
    # (each shuffle mapper ships one candidate row per part, not the full
    # per-part supplier list)
    assert re.search(r"WindowGroupLimit [^\n]*Partial", plan)


def test_q223_corpus_never_broadcast(spark):
    """q223 retrieval eval: every broadcast build must be bounded — the
    query-side scan (vec_id < 20 pushed), the q x k top frame (rank
    window output), or the per-label count aggregate. An unbounded
    embeddings scan inside a BroadcastExchange is the corpus-broadcast
    scale bug this pin exists to catch."""
    from zenodb_spark import queries as Q

    plan = _plan(Q.QUERIES["q223_retrieval_eval"](spark, SF_DIR))
    subs = _broadcast_subtrees(plan)
    assert len(subs) >= 3
    for sub in subs:
        bounded = (
            "LessThan(vec_id,20)" in sub
            or "row_number" in sub
            or re.search(r"HashAggregate\(keys=\[label", sub)
        )
        assert bounded, f"unbounded broadcast build:\n{sub[:400]}"


def test_q224_single_scan_panel(spark):
    """q224 k-anonymity: the 4-level lattice must ride ONE customer scan
    through a Generate (explode) into one (lvl, key) aggregate — four
    per-level rescans of a 100 TB table is the failure mode."""
    from zenodb_spark import queries as Q

    plan = _plan(Q.QUERIES["q224_k_anonymity"](spark, SF_DIR))
    assert len(re.findall(r"Scan parquet [^\n]*customer", plan)) == 1
    assert len(re.findall(r"\bGenerate explode", plan)) == 1
