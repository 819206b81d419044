#!/usr/bin/env python3
"""Driver-sim parity check: reads the Spark result parquet with pandas
(pyarrow) and the oracle via duckdb .df() — the combination that explains
CORRECTNESS_r02's failure pattern (decimal outputs fail, int/str/double
pass). Values canonicalized with repr() at full precision.

Usage: python3 tools/check_driver_sim.py <verify_out_dir> <sf_dir> [names...]
"""
import sys, os, json, glob, math
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon_df(df):
    cols = sorted(df.columns)
    out = []
    for r in df[cols].itertuples(index=False):
        vals = []
        for v in r:
            if isinstance(v, float):
                v = "NaN" if math.isnan(v) else repr(v)
            vals.append(str(v))
        out.append("|".join(vals))
    return sorted(out)


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
        try:
            files = sorted(glob.glob(f"{spath}/*.parquet"))
            sdf = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
            odf = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_bad += 1
            continue
        if sorted(sdf.columns) != sorted(odf.columns):
            print(f"FAIL {name}: cols spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}")
            n_bad += 1
            continue
        a, b = canon_df(sdf), canon_df(odf)
        if a != b:
            diff = [(x, y) for x, y in zip(a, b) if x != y][:2]
            print(f"FAIL {name}: mismatch rows={len(a)}/{len(b)}, e.g. {diff}")
            n_bad += 1
            continue
        print(f"ok   {name} ({len(a)} rows)")
        n_ok += 1
    print(f"== {n_ok} ok, {n_bad} fail")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
