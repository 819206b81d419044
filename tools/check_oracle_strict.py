#!/usr/bin/env python3
"""Strict oracle parity check: FULL-precision value compare (repr), no .9g
rounding — models a driver that hashes exact values.

Usage: python3 tools/check_oracle_strict.py <verify_out_dir> <sf_dir> [names...]
"""
import sys, os, json, math
import duckdb

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
                v = "NaN" if math.isnan(v) else repr(v)
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
    n_ok = n_bad = 0
    only = set(sys.argv[3:])
    for name in sorted(oracle):
        if only and name not in only:
            continue
        spath = os.path.join(out_dir, name)
        if not os.path.isdir(spath):
            print(f"FAIL {name}: no spark result dir")
            n_bad += 1
            continue
        try:
            sres = con.execute(
                f"SELECT * FROM read_parquet('{spath}/*.parquet')")
            scols = [d[0] for d in sres.description]
            srows = sres.fetchall()
            ores = con.execute(oracle[name])
            ocols = [d[0] for d in ores.description]
            orows = ores.fetchall()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_bad += 1
            continue
        if sorted(scols) != sorted(ocols):
            print(f"FAIL {name}: cols spark={sorted(scols)} oracle={sorted(ocols)}")
            n_bad += 1
            continue
        a, b = canon(srows, scols), canon(orows, ocols)
        if len(a) != len(b):
            print(f"FAIL {name}: rows spark={len(a)} oracle={len(b)}")
            n_bad += 1
            continue
        sa, sb = sorted(a), sorted(b)
        if sa != sb:
            diff = [(x, y) for x, y in zip(sa, sb) if x != y][:3]
            print(f"FAIL {name}: value mismatch, e.g. {diff}")
            n_bad += 1
            continue
        print(f"ok   {name} ({len(a)} rows)")
        n_ok += 1
    print(f"== {n_ok} ok, {n_bad} fail")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
