"""Property-based parity tests (hypothesis): the custom distributed
operators must agree with their naive single-node forms on ARBITRARY
inputs, not just the fixtures — randomized key distributions (including
heavy skew, empty frames, all-ties) are exactly where partitioning bugs
hide. Example counts are kept small: each example is a full Spark
round-trip."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import Row, functions as F

from zenodb_spark.operators.prefix import running_total
from zenodb_spark.operators.skew import distinct_count_skew, salted_join

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

keys = st.integers(min_value=0, max_value=4)  # tiny key space → forced skew
vals = st.integers(min_value=-100, max_value=100)


@settings(**_SETTINGS)
@given(
    left=st.lists(st.tuples(keys, vals), min_size=1, max_size=40),
    right=st.lists(st.tuples(keys, vals), min_size=1, max_size=10),
    n_salts=st.integers(min_value=1, max_value=5),
)
def test_salted_join_equals_plain_join(spark, left, right, n_salts):
    ldf = spark.createDataFrame([Row(k=k, v=v) for k, v in left])
    rdf = spark.createDataFrame(
        [Row(k=k, d=d) for k, d in right]
    ).dropDuplicates(["k"])
    plain = sorted(
        map(tuple, ldf.join(rdf, ["k"]).select("k", "v", "d").collect())
    )
    salted = sorted(
        map(
            tuple,
            salted_join(ldf, rdf, ["k"], n_salts=n_salts, salt_from="v")
            .select("k", "v", "d")
            .collect(),
        )
    )
    assert plain == salted


@settings(**_SETTINGS)
@given(rows=st.lists(st.tuples(keys, vals), min_size=1, max_size=50))
def test_distinct_count_skew_equals_count_distinct(spark, rows):
    df = spark.createDataFrame([Row(k=k, v=v) for k, v in rows])
    safe = {
        r.k: r.n_distinct for r in distinct_count_skew(df, ["k"], "v").collect()
    }
    ref = {
        r.k: r.n
        for r in df.groupBy("k").agg(F.count_distinct("v").alias("n")).collect()
    }
    assert safe == ref


@settings(**_SETTINGS)
@given(
    rows=st.lists(vals, min_size=1, max_size=60),
    n_parts=st.integers(min_value=1, max_value=6),
)
def test_running_total_equals_sequential_cumsum(spark, rows, n_parts):
    df = spark.createDataFrame([Row(i=i, v=v) for i, v in enumerate(rows)])
    out = {
        r.i: r.rt
        for r in running_total(
            df, ["i"], "v", out_col="rt", num_partitions=n_parts
        ).collect()
    }
    acc, expected = 0, {}
    for i, v in enumerate(rows):
        acc += v
        expected[i] = acc
    assert out == expected


@settings(**_SETTINGS)
@given(
    points=st.lists(st.integers(min_value=0, max_value=200), min_size=1, max_size=40),
    ivals=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=200),
            st.integers(min_value=0, max_value=60),
        ),
        min_size=1,
        max_size=12,
    ),
    bin_width=st.integers(min_value=1, max_value=64),
)
def test_interval_join_equals_theta_join(spark, points, ivals, bin_width):
    from zenodb_spark.operators.timeops import interval_join

    ldf = spark.createDataFrame([Row(pid=i, p=p) for i, p in enumerate(points)])
    rdf = spark.createDataFrame(
        [Row(rid=i, s=s, e=s + ln) for i, (s, ln) in enumerate(ivals)]
    )
    got = sorted(
        map(
            tuple,
            interval_join(ldf, rdf, "p", "s", "e", bin_width=bin_width)
            .select("pid", "rid")
            .collect(),
        )
    )
    want = sorted(
        map(
            tuple,
            ldf.join(rdf, (F.col("p") >= F.col("s")) & (F.col("p") < F.col("e")))
            .select("pid", "rid")
            .collect(),
        )
    )
    assert got == want


@settings(**_SETTINGS)
@given(
    rows=st.lists(st.integers(min_value=0, max_value=30), min_size=1, max_size=80),
    k=st.integers(min_value=1, max_value=8),
)
def test_heavy_hitters_equals_groupby_threshold(spark, rows, k):
    from zenodb_spark.operators.sketch import heavy_hitters

    df = spark.createDataFrame([Row(key=r) for r in rows]).repartition(4)
    got = sorted(map(tuple, heavy_hitters(df, "key", k).collect()))
    n = len(rows)
    want = sorted(
        map(
            tuple,
            df.groupBy("key")
            .agg(F.count(F.lit(1)).alias("n_occurrences"))
            .filter(F.col("n_occurrences") * k >= n)
            .collect(),
        )
    )
    assert got == want


@settings(**_SETTINGS)
@given(
    rows=st.lists(
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False),
        min_size=1,
        max_size=60,
    ),
    q=st.sampled_from([0.01, 0.25, 0.5, 0.75, 0.99, 1.0]),
)
def test_exact_quantile_2pass_equals_sorted_kth(spark, rows, q):
    import math

    from zenodb_spark.operators.percentile import exact_quantile_2pass

    df = spark.createDataFrame([Row(x=v) for v in rows]).repartition(3)
    got = exact_quantile_2pass(df, "x", q).collect()
    k = max(1, int(math.ceil(q * len(rows))))
    want = sorted(rows)[k - 1]
    assert len(got) == 1 and got[0]["value"] == want and got[0]["k"] == k


# --------------------------------------------------------------------------
# percentile sketch state vs reference HDR semantics (expr/percentile.go:
# 115-144): out-of-bounds values are DROPPED (BOUNDED updated=false, not
# clamped — expr/bounded.go:41-48), in-bounds values land in the
# round-to-nearest bin, hi itself stays in the top bin, merge is exact.
# Adversarial bounds per the round-3 verdict: negative lo, lo == hi,
# precision 0 and 5.
# --------------------------------------------------------------------------

import math


def _model_quantile(vals, p, lo, hi, precision):
    """Driver-side model of hist_agg+hist_quantile: quantize in-bounds
    values to bin lower bounds, pick element ceil(p/100·n)."""
    scale = float(10**precision)
    nbins = int(round((hi - lo) * scale)) + 1
    bins = sorted(
        min(int(math.floor((v - lo) * scale + 0.5)), nbins - 1)
        for v in vals
        if lo <= v <= hi
    )
    if not bins:
        return None
    k = max(1, math.ceil(p / 100.0 * len(bins)))
    # hist_quantile: first occupied bin where cumulative count >= target;
    # target 0 (p=0) → first occupied bin
    if p == 0:
        k = 1
    return bins[k - 1] / scale + lo


_bounds = st.sampled_from(
    [(-5.0, 5.0), (0.0, 0.3), (-10.0, -10.0), (0.0, 100.0), (-7.3, 2.9)]
)
_precisions = st.sampled_from([0, 1, 2, 5])
_pcts = st.sampled_from([0.0, 1.0, 25.0, 50.0, 95.0, 99.0, 100.0])


@settings(**_SETTINGS)
@given(
    raw=st.lists(
        st.floats(min_value=-12.0, max_value=12.0, allow_nan=False),
        min_size=0,
        max_size=40,
    ),
    bounds=_bounds,
    precision=_precisions,
    p=_pcts,
)
def test_hist_quantile_matches_model(spark, raw, bounds, precision, p):
    from zenodb_spark.operators.percentile import hist_agg, hist_quantile

    lo, hi = bounds
    vals = raw + [lo, hi]  # always exercise the exact edges
    df = spark.createDataFrame([Row(g=1, v=float(v)) for v in vals])
    out = (
        hist_agg(df, ["g"], "v", lo, hi, precision)
        .select(hist_quantile("hist", p, lo, precision).alias("q"))
        .collect()
    )
    got = out[0]["q"] if out else None
    want = _model_quantile(vals, p, lo, hi, precision)
    if want is None:
        assert got is None
    else:
        assert got is not None and abs(got - want) < 1e-9, (got, want, vals)


@settings(**_SETTINGS)
@given(
    raw=st.lists(
        st.floats(min_value=-12.0, max_value=12.0, allow_nan=False),
        min_size=2,
        max_size=40,
    ),
    split=st.integers(min_value=1, max_value=39),
    bounds=_bounds,
    precision=_precisions,
)
def test_hist_merge_equals_single_pass(spark, raw, split, bounds, precision):
    from zenodb_spark.operators.percentile import hist_agg, hist_merge, hist_quantile

    lo, hi = bounds
    vals = raw + [lo, hi]
    split = min(split, len(vals) - 1)
    df_all = spark.createDataFrame([Row(g=1, v=float(v)) for v in vals])
    parts = [
        spark.createDataFrame([Row(g=1, v=float(v)) for v in chunk])
        for chunk in (vals[:split], vals[split:])
    ]
    merged = (
        hist_agg(parts[0], ["g"], "v", lo, hi, precision)
        .unionByName(hist_agg(parts[1], ["g"], "v", lo, hi, precision))
        .groupBy("g")
        .agg(hist_merge("hist").alias("hist"))
        .select(hist_quantile("hist", 50.0, lo, precision).alias("q"))
        .collect()
    )
    single = (
        hist_agg(df_all, ["g"], "v", lo, hi, precision)
        .select(hist_quantile("hist", 50.0, lo, precision).alias("q"))
        .collect()
    )
    got = merged[0]["q"] if merged else None
    want = single[0]["q"] if single else None
    assert (got is None and want is None) or abs(got - want) < 1e-12


def test_hist_bin_rejects_inverted_bounds(spark):
    import pytest

    from zenodb_spark.operators.percentile import hist_bin

    with pytest.raises(ValueError, match="inverted"):
        hist_bin(F.lit(1.0), 5.0, -5.0, 1)


# ---------------------------------------------------------------------------
# distribution statistics (operators/stats.py)
# ---------------------------------------------------------------------------


def _naive_ks(rows, group):
    """Direct KS: max over thresholds of |F_g − F_rest| via Python floats."""
    import itertools

    g = sorted(v for gg, v in rows if gg == group)
    rest = sorted(v for gg, v in rows if gg != group)
    if not g or not rest:
        return None
    xs = sorted(set(g) | set(rest))
    best = 0.0
    for x in xs:
        f1 = sum(1 for v in g if v <= x) / len(g)
        f2 = sum(1 for v in rest if v <= x) / len(rest)
        best = max(best, abs(f1 - f2))
    return best


@settings(**_SETTINGS)
@given(
    rows=st.lists(
        st.tuples(st.integers(min_value=0, max_value=3), st.integers(min_value=-20, max_value=20)),
        min_size=2,
        max_size=60,
    )
)
def test_ks_distance_matches_naive(spark, rows):
    from zenodb_spark.operators.stats import ks_distance_by_group

    df = spark.createDataFrame([Row(g=str(g), x=v) for g, v in rows])
    got = {
        r["g"]: (r["n_docs"], r["ks"])
        for r in ks_distance_by_group(df, "g", "x").collect()
    }
    groups = {str(g) for g, _ in rows}
    assert set(got) == groups
    for grp in groups:
        n_docs, ks = got[grp]
        assert n_docs == sum(1 for g, _ in rows if str(g) == grp)
        want = _naive_ks([(str(g), v) for g, v in rows], grp)
        if want is None:  # single-group frame: n2 == 0, D undefined
            assert ks is None
            continue
        assert ks == pytest.approx(want, abs=1e-12)


def _naive_chi2(rows):
    """Direct per-row-category chi2 contributions with micro-quantized
    cell terms (the operator's documented quantization contract)."""
    import math
    from collections import Counter

    o = Counter(rows)
    rtot = Counter(g for g, _ in rows)
    ctot = Counter(c for _, c in rows)
    n = len(rows)
    out = {}
    for g in rtot:
        s = 0
        for c in ctot:
            diff = float(o.get((g, c), 0) * n - rtot[g] * ctot[c])
            term = diff * diff / (float(n) * float(rtot[g]) * float(ctot[c]))
            s += math.floor(term * 1e6 + 0.5)
        out[g] = (len(ctot), s / 1e6)
    return out


@settings(**_SETTINGS)
@given(
    rows=st.lists(
        st.tuples(st.integers(min_value=0, max_value=3), st.integers(min_value=0, max_value=2)),
        min_size=1,
        max_size=60,
    )
)
def test_chi2_contingency_matches_naive(spark, rows):
    from zenodb_spark.operators.stats import chi2_contingency

    df = spark.createDataFrame([Row(g=str(g), c=str(c)) for g, c in rows])
    got = {
        r["g"]: (r["n_cells"], r["chi2_contrib"])
        for r in chi2_contingency(df, "g", "c").collect()
    }
    want = {str(g): v for g, v in _naive_chi2([(str(g), str(c)) for g, c in rows]).items()}
    assert set(got) == set(want)
    for g in want:
        assert got[g][0] == want[g][0]
        assert got[g][1] == pytest.approx(want[g][1], abs=1e-9)


def _naive_anova(rows):
    """Direct one-way ANOVA with per-group micro-quantized between-terms
    (the operator's documented quantization contract)."""
    import math
    from collections import defaultdict

    by = defaultdict(list)
    for g, v in rows:
        by[g].append(v)
    k, n = len(by), len(rows)
    s = sum(v for _, v in rows)
    q = sum(v * v for _, v in rows)
    tsum = sum(
        math.floor(float(sum(vs)) * sum(vs) / len(vs) * 1e6 + 0.5)
        for vs in by.values()
    )
    grand = math.floor(float(s) * s / n * 1e6 + 0.5)
    ssb_m, ssw_m = tsum - grand, q * 1000000 - tsum
    f = None
    if k > 1 and n > k and ssw_m != 0:
        f = (ssb_m / (k - 1)) / (ssw_m / (n - k))
    return k, n, ssb_m / 1e6, ssw_m / 1e6, f


@settings(**_SETTINGS)
@given(
    rows=st.lists(
        st.tuples(st.integers(min_value=0, max_value=3), st.integers(min_value=0, max_value=50)),
        min_size=4,
        max_size=60,
    )
)
def test_anova_matches_naive(spark, rows):
    from zenodb_spark.operators.stats import anova_oneway

    df = spark.createDataFrame([Row(g=str(g), x=v) for g, v in rows])
    r = anova_oneway(df, "g", "x").collect()[0]
    k, n, ssb, ssw, f = _naive_anova([(str(g), v) for g, v in rows])
    assert (r["n_groups"], r["n"]) == (k, n)
    assert r["ssb"] == pytest.approx(ssb, abs=1e-9)
    assert r["ssw"] == pytest.approx(ssw, abs=1e-9)
    if f is not None:
        assert r["f_stat"] == pytest.approx(f, rel=1e-12)


def _naive_mwu(rows, group):
    """Direct Mann-Whitney U with midranks + tie-corrected z."""
    import math

    pooled = sorted(v for _, v in rows)
    n = len(pooled)
    n1 = sum(1 for g, _ in rows if g == group)
    n2 = n - n1
    if n1 == 0 or n2 == 0:
        return None
    # midrank of each value in the pooled ranking
    first = {}
    for i, v in enumerate(pooled):
        first.setdefault(v, i)
    def midrank(v):
        c = pooled.count(v)
        return first[v] + 1 + (c - 1) / 2.0
    r1 = sum(midrank(v) for g, v in rows if g == group)
    u = r1 - n1 * (n1 + 1) / 2.0
    tie3 = 0
    for v in set(pooled):
        t = pooled.count(v)
        tie3 += t * t * t - t
    var = n1 * n2 / 12.0 * ((n + 1) - tie3 / (n * (n - 1))) if n > 1 else 0.0
    z = (u - n1 * n2 / 2.0) / math.sqrt(var) if var > 0 else None
    return n1, u, z


@settings(**_SETTINGS)
@given(
    rows=st.lists(
        st.tuples(st.integers(min_value=0, max_value=2), st.integers(min_value=0, max_value=8)),
        min_size=2,
        max_size=50,
    )
)
def test_mann_whitney_matches_naive(spark, rows):
    from zenodb_spark.operators.stats import mann_whitney_u

    df = spark.createDataFrame([Row(g=str(g), x=v) for g, v in rows])
    got = {r["g"]: r for r in mann_whitney_u(df, "g", "x").collect()}
    groups = {str(g) for g, _ in rows}
    assert set(got) == groups
    for grp in groups:
        want = _naive_mwu([(str(g), v) for g, v in rows], grp)
        if want is None:
            continue
        n1, u, z = want
        assert got[grp]["n"] == n1
        assert got[grp]["u"] == pytest.approx(u, abs=1e-9)
        if z is not None:
            assert got[grp]["z"] == pytest.approx(z, rel=1e-9)


def test_poisson_bootstrap_deterministic_and_sane(spark):
    """Same inputs → bit-identical CI across runs (md5-seeded draws); the
    interval brackets the exact mean on a well-behaved sample."""
    from zenodb_spark.operators.stats import poisson_bootstrap_mean_ci

    rows = [Row(g="a", x=int(v), i=n) for n, v in enumerate([10, 12, 9, 11, 10, 13, 8, 10, 11, 12] * 5)]
    df = spark.createDataFrame(rows)
    a = poisson_bootstrap_mean_ci(df, "g", "x", "i", reps=24).collect()[0]
    b = poisson_bootstrap_mean_ci(df, "g", "x", "i", reps=24).collect()[0]
    assert (a["ci_lo"], a["ci_hi"]) == (b["ci_lo"], b["ci_hi"])
    assert a["ci_lo"] <= a["mean"] <= a["ci_hi"]
    assert a["n"] == 50
