#!/usr/bin/env python3
"""Perf gate: fail if any query exceeds OUTLIER_X times the suite median.

Correctness gates cannot catch correct-but-quadratic plans (r5 shipped
q558 at 500x the median with every oracle green); this can. Reads the
full per-query timings that graft.Bench writes to BENCH_local.json.

Usage: python3 tools/check_bench_outliers.py [BENCH_local.json] [mult]
Exit 1 when an outlier exists (and prints it), 0 otherwise.
"""
import json
import statistics
import sys

path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_local.json"
mult = float(sys.argv[2]) if len(sys.argv) > 2 else 20.0

# Documented exemptions — none. q300's round-7 exemption closed in
# round 8: the support-filtered edge census is bounded, so
# Components.connectedComponents routes it through one-task union-find
# (7.7 s -> ~0.5 s at sf0.1).
EXEMPT = set()

with open(path) as f:
    data = json.loads(f.read())
qs = data["queries"]
# crashed queries are recorded as -1 by graft.Bench — hard-fail the gate
# on them instead of letting them pass as near-instant successes.
failures = sorted(k for k, v in qs.items() if v < 0)
for k in failures:
    print(f"FAILED  {k}: bench recorded a crash (value {qs[k]})")
timed = {k: v for k, v in qs.items() if v >= 0}
if not timed:
    print("FAILED: every query crashed — nothing to compute a median over")
    sys.exit(1)
med = statistics.median(timed.values())
# floor the threshold: honest multi-stage queries (iterative graph
# rounds, IRLS) carry fixed per-job overhead that dominates at small SF.
# The 8.0s floor is tuned to sf0.1 medians (~0.33s); at smaller SFs an
# 8s floor would mask genuine 100x-median outliers, so scale it down.
sf_name = str(data.get("sf", "")).rstrip("/").rsplit("/", 1)[-1]
floor = 8.0 if sf_name == "sf0.1" else 3.0
thresh = max(med * mult, floor)
bad = {k: v for k, v in timed.items() if v > thresh and k not in EXEMPT}
for k in sorted(EXEMPT & timed.keys()):
    if timed[k] > thresh:
        print(f"exempt  {k}: {timed[k]:.3f}s (documented iterative shape)")
print(f"median {med:.3f}s over {len(timed)} queries; sf={sf_name or '?'} gate {thresh:.1f}s")
for k, v in sorted(bad.items(), key=lambda kv: -kv[1]):
    print(f"OUTLIER {k}: {v:.3f}s ({v / med:.0f}x median)")
if bad or failures:
    sys.exit(1)
print("ok: no query exceeds the outlier gate")
