"""Bench regression guard: compare two bench JSON artifacts with the
rule the round reviews apply by hand — a query regresses when it is
BOTH >30% slower AND >0.3 s absolute slower than the previous round's
median. Run after refreshing BENCH_FULL.json:

    python bench.py                       # writes BENCH_FULL.json at sf0.1
    python scripts/bench_compare.py BENCH_FULL.json.prev BENCH_FULL.json

Exit 1 (CI-style loud failure) if any regression trips; prints the
full changed-query table either way. New/removed queries are listed
but never fail the guard (additions have no baseline).
"""

from __future__ import annotations

import json
import math
import sys

REL_THRESHOLD = 0.30  # >30% slower ...
ABS_THRESHOLD = 0.30  # ... AND >0.3 s slower


def load(path: str) -> dict[str, float]:
    with open(path) as f:
        return json.load(f)["queries"]


def main() -> int:
    if len(sys.argv) != 3:
        print(__doc__)
        return 2
    prev, cur = load(sys.argv[1]), load(sys.argv[2])
    common = sorted(set(prev) & set(cur))
    added = sorted(set(cur) - set(prev))
    removed = sorted(set(prev) - set(cur))

    regressions, improvements = [], []
    prev_total = cur_total = 0.0
    for name in common:
        p, c = prev[name], cur[name]
        if math.isnan(p) or math.isnan(c):
            continue
        prev_total += p
        cur_total += c
        delta = c - p
        # A zero/near-zero baseline must still regress: >ABS over a 0s
        # baseline is infinitely-relative, so the relative clause only
        # APPLIES when p > 0 (it can never excuse a p == 0 case).
        if delta > ABS_THRESHOLD and (p <= 0 or delta / p > REL_THRESHOLD):
            regressions.append((name, p, c))
        elif -delta > ABS_THRESHOLD and p > 0 and -delta / p > REL_THRESHOLD:
            improvements.append((name, p, c))

    if common:
        ratio = f" ({cur_total / prev_total:.2f}x)" if prev_total else ""
        print(f"common queries: {len(common)}  total {prev_total:.1f}s -> "
              f"{cur_total:.1f}s{ratio}")
    else:
        print("no common queries")
    for label, rows in (("REGRESSION", regressions), ("improved", improvements)):
        for name, p, c in rows:
            ratio = f"{c / p:.2f}x" if p > 0 else "new-cost"
            print(f"  {label:10s} {name:40s} {p:7.2f}s -> {c:7.2f}s ({ratio})")
    if added:
        print(f"  new queries (no baseline): {', '.join(added)}")
    if removed:
        print(f"  removed queries: {', '.join(removed)}")
    if regressions:
        print(f"FAIL: {len(regressions)} regression(s) over the >{REL_THRESHOLD:.0%} "
              f"and >{ABS_THRESHOLD}s rule")
        return 1
    print("PASS: no per-query regression over threshold")
    return 0


if __name__ == "__main__":
    sys.exit(main())
