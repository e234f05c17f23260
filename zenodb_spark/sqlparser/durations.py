"""ZenoDB duration grammar: Go durations extended with `d` (day) and `w`
(week) units (reference sql/duration.go:14–25). Returns seconds (float for
sub-second units)."""

from __future__ import annotations

import re

_UNITS = {
    "ns": 1e-9,
    "us": 1e-6,
    "µs": 1e-6,
    "ms": 1e-3,
    "s": 1.0,
    "m": 60.0,
    "h": 3600.0,
    "d": 86400.0,
    "w": 7 * 86400.0,
}

_TOKEN = re.compile(r"(\d+(?:\.\d+)?)(ns|us|µs|ms|s|m|h|d|w)")


def parse_duration(text: str) -> float:
    """Parse '2h45m' / '15m' / '1d' / '1w2d' → seconds."""
    text = text.strip()
    neg = text.startswith("-")
    if neg:
        text = text[1:]
    pos = 0
    total = 0.0
    for m in _TOKEN.finditer(text):
        if m.start() != pos:
            raise ValueError(f"invalid duration: {text!r}")
        total += float(m.group(1)) * _UNITS[m.group(2)]
        pos = m.end()
    if pos != len(text) or pos == 0:
        raise ValueError(f"invalid duration: {text!r}")
    return -total if neg else total


def format_duration(seconds: float) -> str:
    """Inverse of parse_duration for naming CROSSHIFT columns (e.g. 86400 → '1d')."""
    out = []
    rem = seconds
    for unit, size in (("w", 7 * 86400.0), ("d", 86400.0), ("h", 3600.0), ("m", 60.0), ("s", 1.0)):
        n = int(rem // size)
        if n:
            out.append(f"{n}{unit}")
            rem -= n * size
    return "".join(out) or "0s"
