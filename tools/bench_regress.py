#!/usr/bin/env python3
"""Per-query bench regression gate (BASELINE.md convention, automated).

Usage: python3 tools/bench_regress.py [bench_full.json] [BASELINE_BENCH.json]

Diffs the round's min-of-N per-query table (bench_full.json, written by
graft.Bench) against the standing yardstick (BASELINE_BENCH.json) and
prints every query reading >2x its yardstick min — the weak-flag
convention: 2x on a min-of-N reading, never on a single-rep one. Also
reports new queries (no yardstick row) and the 5 largest improvements,
so the output pasted into PERF.md is the whole adjudication, not just
the failures. Exit code 1 iff any >2x regression exists.

Both inputs must be min-of-N artifacts (n_reps >= 2): comparing a
single-rep run against a min-of-2 yardstick re-opens the noise class
this gate exists to close (r13-r15: same-jar single readings flap 3-4x).
"""
import json
import sys

cur_path = sys.argv[1] if len(sys.argv) > 1 else "bench_full.json"
base_path = sys.argv[2] if len(sys.argv) > 2 else "BASELINE_BENCH.json"

cur = json.load(open(cur_path))
base = json.load(open(base_path))

for name, d in (("current", cur), ("baseline", base)):
    if d.get("n_reps", 1) < 2:
        print(f"WARNING: {name} artifact is single-rep (n_reps="
              f"{d.get('n_reps')}) — min-of-N convention not met; "
              "readings below are noise-exposed")

cq, bq = cur["queries"], base["queries"]
new = sorted(set(cq) - set(bq))
gone = sorted(set(bq) - set(cq))
shared = sorted(set(cq) & set(bq))

rows = [(n, cq[n], bq[n], cq[n] / bq[n] if bq[n] > 0 else float("inf"))
        for n in shared]
regress = [r for r in rows if r[3] > 2.0]
# sub-100ms rows are JVM-noise-dominated at any rep count; list them
# separately so a 0.04s -> 0.09s flap doesn't read like a scale problem
regress_real = [r for r in regress if r[2] >= 0.1]
regress_tiny = [r for r in regress if r[2] < 0.1]

print(f"queries: {len(cq)} current / {len(bq)} baseline "
      f"({len(new)} new, {len(gone)} removed)")
print(f"total: {cur.get('value', 0):.2f}s vs {base.get('value', 0):.2f}s "
      f"baseline ({cur.get('n_reps')} vs {base.get('n_reps')} reps)")
if new:
    print("new (no yardstick):", " ".join(f"{n}={cq[n]:.2f}s" for n in new))
if gone:
    print("removed:", " ".join(gone))

if regress_real:
    print(f"\nREGRESSIONS >2x ({len(regress_real)}):")
    for n, c, b, r in sorted(regress_real, key=lambda x: -x[3]):
        print(f"  {n}: {c:.2f}s vs {b:.2f}s  ({r:.2f}x)")
else:
    print("\nno >2x regression on any shared query (min-of-N basis)")
if regress_tiny:
    print(f"sub-100ms flaps >2x (noise class, not gated): "
          + " ".join(f"{n} {b:.3f}->{c:.3f}s" for n, c, b, r in regress_tiny))

improved = sorted(rows, key=lambda x: x[3])[:5]
print("largest improvements:",
      " ".join(f"{n} {b:.2f}->{c:.2f}s" for n, c, b, r in improved))

sys.exit(1 if regress_real else 0)
