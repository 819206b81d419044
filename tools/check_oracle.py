#!/usr/bin/env python3
"""Local oracle parity check (dev tool, mirrors the driver's compare).

Usage: python3 tools/check_oracle.py <verify_out_dir> <sf_dir>

Reads each <out>/<name>/ parquet (Spark result) and runs the matching SQL
from <out>/oracle_sql.json in DuckDB over the sf_dir tables; compares
rows/schema/values after sorting columns by name (like the driver).
"""
import sys, os, json, math, threading
import duckdb

# Optional per-query watchdog (seconds) for big-SF sweeps: DuckDB gets
# interrupted after the budget and the query is recorded as TIMEOUT
# (exit stays 0 for timeouts — they are a feasibility report, not a
# parity failure; the caller decides what a timeout means at that SF).
TIMEOUT_S = float(os.environ.get("ORACLE_TIMEOUT_S", "0") or 0)

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
                else:
                    v = f"{v:.9g}"
            vals.append(str(v))
        out.append("|".join(vals))
    return out


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_ok = n_bad = n_timeout = 0
    only = set(sys.argv[3:])
    # Optional: dump per-query DuckDB oracle seconds (runs=1) so a big-SF
    # parity sweep doubles as a baseline timing pass (bench_baseline.py
    # sentinel conventions: -2 timeout, -1 error).
    times_json = os.environ.get("ORACLE_TIMES_JSON")
    times = {}
    for name in sorted(oracle):
        if only and name not in only:
            continue
        spath = os.path.join(out_dir, name)
        if not os.path.isdir(spath):
            print(f"FAIL {name}: no spark result dir")
            n_bad += 1
            continue
        watchdog = threading.Timer(TIMEOUT_S, con.interrupt) if TIMEOUT_S else None
        if watchdog:
            watchdog.start()
        try:
            sres = con.execute(
                f"SELECT * FROM read_parquet('{spath}/*.parquet')")
            scols = [d[0] for d in sres.description]
            srows = sres.fetchall()
            import time as _time
            t0 = _time.perf_counter()
            ores = con.execute(oracle[name])
            ocols = [d[0] for d in ores.description]
            orows = ores.fetchall()
            times[name] = round(_time.perf_counter() - t0, 3)
        except duckdb.InterruptException:
            print(f"TIMEOUT {name}: oracle exceeded {TIMEOUT_S:.0f}s "
                  f"(spark rows dumped ok; parity not assessed)", flush=True)
            n_timeout += 1
            times[name] = -2.0
            continue
        except Exception as e:
            print(f"FAIL {name}: {e}", flush=True)
            n_bad += 1
            times[name] = -1.0
            continue
        finally:
            if watchdog:
                watchdog.cancel()
        if sorted(scols) != sorted(ocols):
            print(f"FAIL {name}: cols spark={sorted(scols)} oracle={sorted(ocols)}")
            n_bad += 1
            continue
        a, b = canon(srows, scols), canon(orows, ocols)
        if len(a) != len(b):
            print(f"FAIL {name}: rows spark={len(a)} oracle={len(b)}")
            n_bad += 1
            continue
        if sorted(a) != sorted(b):
            diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
            print(f"FAIL {name}: value mismatch, e.g. {diff}")
            n_bad += 1
            continue
        print(f"ok   {name} ({len(a)} rows)", flush=True)
        n_ok += 1
    if times_json:
        total = sum(v for v in times.values() if v >= 0)
        json.dump({"engine": f"duckdb {duckdb.__version__}", "sf": sf_dir,
                   "runs": 1, "unit": "sec", "total": round(total, 3),
                   "n_queries": len(times), "timeout_s": TIMEOUT_S,
                   "queries": times}, open(times_json, "w"), indent=0)
    print(f"== {n_ok} ok, {n_bad} fail" +
          (f", {n_timeout} oracle-timeout" if n_timeout else ""))
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
