"""Compare a fresh bench.py run against a recorded baseline (the latest
driver-recorded BENCH_r{NN}.json by default): per-query ratio table, flagging >1.5x regressions.

Usage: python bench.py 2>/dev/null | tail -1 | python tools/bench_delta.py
   or: python tools/bench_delta.py <bench_json_file> [baseline_file]
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def main() -> int:
    if len(sys.argv) > 1:
        cur = json.loads(Path(sys.argv[1]).read_text())
    else:
        cur = json.loads(sys.stdin.read().strip().splitlines()[-1])
    if len(sys.argv) > 2:
        base_path = Path(sys.argv[2])
    else:
        # latest driver-recorded round bench is the default baseline
        rounds = sorted(ROOT.glob("BENCH_r[0-9][0-9].json"))
        base_path = rounds[-1] if rounds else ROOT / "BENCH_r01.json"
    base = json.loads(base_path.read_text())
    # driver-recorded BENCH_r{N}.json wraps the bench line under "parsed"
    base = base.get("parsed", base)
    cur = cur.get("parsed", cur)
    bq, cq = base.get("queries", {}), cur.get("queries", {})
    regressions = []
    print(f"{'query':<28}{'base':>8}{'now':>8}{'ratio':>7}")
    for name in sorted(set(bq) | set(cq)):
        b, c = bq.get(name), cq.get(name)
        if b is None or c is None:
            print(f"{name:<28}{b or '-':>8}{c or '-':>8}{'new' if b is None else 'gone':>7}")
            continue
        r = c / b if b else float("inf")
        flag = "  <-- REGRESSION >1.5x" if r > 1.5 else ""
        print(f"{name:<28}{b:>8.2f}{c:>8.2f}{r:>7.2f}{flag}")
        if r > 1.5:
            regressions.append(name)
    tb, tc = base.get("value"), cur.get("value")
    print(f"{'TOTAL':<28}{tb:>8.2f}{tc:>8.2f}{tc / tb:>7.2f}")
    if regressions:
        print(f"\nregressions >1.5x: {regressions}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
