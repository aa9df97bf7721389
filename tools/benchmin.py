#!/usr/bin/env python3
"""Merge two Bench full-JSON sessions into the per-query-min file the
head-to-head merge consumes (the SCALING.md min-of-k discipline at the
session level: wall noise only ever adds, so per-query MIN across
sessions compares floors to floors).

Usage: benchmin.py <a.json> <b.json> <out.json>
"""
import json, sys

a = json.load(open(sys.argv[1]))
b = json.load(open(sys.argv[2]))
qa, qb = a["queries"], b["queries"]
# Explicit raises, not asserts: python -O strips asserts, which would
# silently let a failed query's -1 win the per-query min.
if set(qa) != set(qb):
    raise SystemExit(f"sessions ran different query sets: "
                     f"only-a={sorted(set(qa) - set(qb))} "
                     f"only-b={sorted(set(qb) - set(qa))}")
# Bench records a failed query as -1; a -1 must never win the min (it
# would silently make the merged artifact FASTER). Refuse to merge
# sessions with failures — the artifact is only defined over clean runs.
bad = sorted(q for q in qa if qa[q] <= 0 or qb[q] <= 0)
if bad:
    raise SystemExit(f"failed queries in a session (time <= 0): {bad}")
mins = {q: min(qa[q], qb[q]) for q in qa}
out = {
    "protocol": "per-query MIN across 2 Bench sessions (each itself "
                "min-of-2 timed passes after warm-up)",
    "sessions": [sys.argv[1], sys.argv[2]],
    "session_totals": [a.get("value"), b.get("value")],
    "value": round(sum(mins.values()), 2),
    "queries": mins,
}
json.dump(out, open(sys.argv[3], "w"), indent=0)
print(f"wrote {sys.argv[3]}: n={len(mins)} sum_of_mins={out['value']} "
      f"sessions={out['session_totals']}")
