#!/usr/bin/env python3
"""Static oracle-type sweep (dev tool; driver-side python only).

DESCRIBEs every oracle SQL in DuckDB against the sf tables and rejects
output columns whose type pandas would render differently from Spark's
integer output: HUGEINT / UHUGEINT (sum(BIGINT) et al.) and DECIMAL.
This is the exact class behind the 9 CORRECTNESS_r04 driver reds — the
strict fetchall compare passes but the driver's pandas .df() path turns
un-cast HUGEINT into float (5681.0 vs 5681).

Usage:
  sbt -batch "runMain graft.tools.DumpOracleSql /tmp/oracle_sql.json"
  python3 tools/check_oracle_types.py /tmp/oracle_sql.json /root/testdata/sf0.001
"""
import sys, os, json
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

BAD = ("HUGEINT", "UHUGEINT", "DECIMAL")


def main():
    sql_path, sf_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(sql_path))
    n_ok = n_bad = 0
    for name in sorted(oracle):
        try:
            desc = con.execute(f"DESCRIBE ({oracle[name]})").fetchall()
        except Exception as e:
            print(f"FAIL {name}: DESCRIBE error: {e}")
            n_bad += 1
            continue
        bad_cols = [(c, ty) for c, ty, *_ in desc
                    if any(ty.upper().startswith(b) for b in BAD)]
        if bad_cols:
            print(f"FAIL {name}: un-cast oracle columns {bad_cols}")
            n_bad += 1
        else:
            n_ok += 1
    print(f"== {n_ok} ok, {n_bad} bad-typed")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
