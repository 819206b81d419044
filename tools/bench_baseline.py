#!/usr/bin/env python3
"""Time the DuckDB oracle suite — the measured single-node baseline.

BASELINE.json defines a "within 2x of baseline" gate but the reference
(Django/Celery/PostGIS) publishes no query benchmarks, so for rounds
1-6 the gate was formally unassessable. The oracle SQL for every query
already exists and runs on the same parquet; timing it in DuckDB gives
a stable, per-query, same-data reference. Single-node DuckDB beating
local[32] Spark at small SFs is expected (Spark carries ~0.2-0.5s of
fixed per-query overhead) — the point is that regressions become
relative to something real. Pair with tools/check_vs_baseline.py.

Usage: python3 tools/bench_baseline.py <oracle_sql.json> <sf_dir> \
           [runs=3] [out=BASELINE_local.json]

Each query is timed min-of-N (same policy as graft.Bench: the min
filters transient host throttling). A watchdog interrupts any single
run after TIMEOUT_S and records the query as -2 (timeout) rather than
hanging the suite.
"""
import json
import os
import sys
import threading
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]
TIMEOUT_S = 120.0


def main():
    oracle_path, sf_dir = sys.argv[1], sys.argv[2]
    runs = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    out_path = sys.argv[4] if len(sys.argv) > 4 else "BASELINE_local.json"
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(oracle_path))
    results = {}
    for name in sorted(oracle):
        best = None
        for _ in range(runs):
            fired = threading.Timer(TIMEOUT_S, con.interrupt)
            fired.start()
            t0 = time.perf_counter()
            try:
                con.execute(oracle[name]).fetchall()
                dt = time.perf_counter() - t0
            except duckdb.InterruptException:
                dt = -2.0  # timeout sentinel
            except Exception as e:
                print(f"[baseline] {name}: ERROR {e}", file=sys.stderr)
                dt = -1.0  # error sentinel
            finally:
                fired.cancel()
            if dt < 0:
                best = dt
                break
            best = dt if best is None else min(best, dt)
        results[name] = round(best, 4)
        print(f"[baseline] {name}: {best:.3f}s", file=sys.stderr)
    total = sum(v for v in results.values() if v >= 0)
    doc = {"engine": f"duckdb {duckdb.__version__}", "sf": sf_dir,
           "runs": runs, "unit": "sec", "total": round(total, 3),
           "n_queries": len(results), "queries": results}
    with open(out_path, "w") as f:
        json.dump(doc, f, indent=0)
        f.write("\n")
    print(f"[baseline] wrote {out_path}: {len(results)} queries, "
          f"total {total:.1f}s")


if __name__ == "__main__":
    main()
