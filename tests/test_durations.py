"""Property tests for the Go-style duration grammar (reference
sql/duration.go:14-25 — units ns…w including non-standard d/w)."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from zenodb_spark.sqlparser.durations import format_duration, parse_duration

UNITS = {"s": 1.0, "m": 60.0, "h": 3600.0, "d": 86400.0, "w": 7 * 86400.0}


@given(st.integers(1, 10**6), st.sampled_from(sorted(UNITS)))
@settings(max_examples=200, deadline=None)
def test_parse_single_unit(n, unit):
    assert parse_duration(f"{n}{unit}") == n * UNITS[unit]


@given(
    st.lists(
        st.tuples(st.integers(1, 999), st.sampled_from(["w", "d", "h", "m", "s"])),
        min_size=1,
        max_size=4,
        unique_by=lambda t: t[1],
    )
)
@settings(max_examples=200, deadline=None)
def test_parse_compound(parts):
    order = {"w": 0, "d": 1, "h": 2, "m": 3, "s": 4}
    parts = sorted(parts, key=lambda t: order[t[1]])
    text = "".join(f"{n}{u}" for n, u in parts)
    assert parse_duration(text) == sum(n * UNITS[u] for n, u in parts)


@given(st.integers(1, 10**7))
@settings(max_examples=300, deadline=None)
def test_format_parse_roundtrip(seconds):
    assert parse_duration(format_duration(float(seconds))) == float(seconds)
