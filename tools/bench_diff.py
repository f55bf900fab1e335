"""Round-over-round per-query bench comparison.

Compares two complete bench results (the BENCH_LOCAL.json files
bench.py writes — full medians, no driver-side truncation) and prints
the queries whose medians moved beyond a threshold, plus suite-level
deltas. This is the tool the drift-A/B protocol (SCALE.md r7) starts
from: run bench.py, commit BENCH_LOCAL.json, and diff against the
prior round's copy out of git history:

    git show <prior-round-sha>:BENCH_LOCAL.json > /tmp/prev.json
    python tools/bench_diff.py /tmp/prev.json BENCH_LOCAL.json

Movements within the recorded spread_pct of either side are marked
"within spread" — the honest no-action zone.
"""

from __future__ import annotations

import json
import sys


def main() -> int:
    if len(sys.argv) != 3:
        print(__doc__)
        return 2
    a = json.load(open(sys.argv[1]))
    b = json.load(open(sys.argv[2]))
    qa, qb = a["queries"], b["queries"]
    sa, sb = a.get("spread_pct", {}), b.get("spread_pct", {})
    shared = sorted(set(qa) & set(qb))
    print(
        f"suite: {a['value']}s/{len(qa)}q -> {b['value']}s/{len(qb)}q "
        f"(shared {len(shared)}; +{sorted(set(qb) - set(qa))} "
        f"-{sorted(set(qa) - set(qb))})"
    )
    moved = []
    for q in shared:
        va, vb = qa[q], qb[q]
        if va <= 0:
            continue
        pct = 100.0 * (vb - va) / va
        tol = max(sa.get(q, 0.0), sb.get(q, 0.0), 15.0)
        if abs(pct) > tol and abs(vb - va) > 0.15:
            moved.append((pct, q, va, vb, tol))
    for pct, q, va, vb, tol in sorted(moved, key=lambda x: -abs(x[0])):
        print(f"{pct:+7.1f}%  {q}: {va}s -> {vb}s  (spread tol {tol:.0f}%)")
    if not moved:
        print("no per-query movement beyond spread")
    return 0


if __name__ == "__main__":
    main()
