#!/usr/bin/env python3
"""Build the sf1 test mirror: 10 disjoint replica universes of sf0.1.

The driver ships sf0.001/0.01/0.1 only; the round-8 goal is a decade up,
where Spark's fixed per-query overhead stops dominating the ratio to the
DuckDB single-node baseline. The generator's own scaling (verified by
comparing sf0.01 to sf0.1) grows every table ~10x INSIDE the same value
domains: same Jan-2024 event window with 10x users, 10x distinct docs
with the same length/lang/source profile, dims (part/supplier/customer)
also 10x while categorical domains (brand, type, segment, event_type)
stay fixed. The faithful model for that is replica universes:

 - every key column gets a per-replica stride, CONSISTENTLY across
   tables (orders.o_custkey strides with customer.c_custkey, lineitem's
   part/supp refs with part/supplier), so each replica is a closed
   sub-universe: per-key join fanout, per-customer order counts and
   per-part lineitem counts are exactly the sf0.1 generator's.
 - document text is Caesar-rotated per replica (replica k shifts the
   alphabet by k; k=0 is the identity). Two distinct shifts agree on
   ZERO letters, so cross-replica shingle sets are disjoint at both
   char and word granularity: near-dup/similarity DENSITY stays
   constant and the true answers of the dedup/similarity families grow
   linearly (identical replicas would grow them quadratically — the
   ProbeScaleSim lesson). Length, word shape, digits and punctuation
   are untouched, so n_chars/band/quality profiles keep their shape.
 - embeddings rotate their dims by k (mod 64) — norms and per-dim
   distributions preserved, replicas mutually near-orthogonal, so ANN
   bucket density stays constant.
 - events keep the real generator's model: same time window, fresh
   user/event ids (per-hour user density genuinely grows, as it does
   between the shipped SFs).
 - nation/region are fixed dimensions at every SF (TPC-H style): copied.

Written with DuckDB so each table stays ONE parquet file with the exact
source column types (events.ts TIMESTAMP in particular — Spark would
rewrite it as BIGINT nanos and break every epoch_ms() oracle).

Usage: python3 tools/make_sf1.py [out_dir=/tmp/graft_sf1] [factor=10]
"""
import os
import string
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_sf1"
FACTOR = int(sys.argv[2]) if len(sys.argv) > 2 else 10

# strides: > the max source key by a wide margin, mutually consistent
S_ORDER, S_CUST, S_PART, S_SUPP = 100_000_000, 10_000_000, 1_000_000, 100_000
S_DOC, S_VEC, S_EVENT, S_USER = 10_000_000, 10_000_000, 1_000_000_000, 10_000_000

AZ = string.ascii_lowercase


def caesar(k):
    lo = AZ[k % 26:] + AZ[:k % 26]
    return AZ + AZ.upper(), lo + lo.upper()


def main():
    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count()}")

    def t(name):
        return f"read_parquet('{SRC}/{name}.parquet')"

    def build(name, select_for_k):
        sql = " UNION ALL ".join(select_for_k(k) for k in range(FACTOR))
        con.execute(
            f"COPY ({sql}) TO '{OUT}/{name}.parquet' (FORMAT PARQUET)")
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{OUT}/{name}.parquet')"
        ).fetchone()[0]
        print(f"[sf1] {name}: {n} rows")

    build("orders", lambda k: f"""
        SELECT o_orderkey + {k * S_ORDER} AS o_orderkey,
               o_custkey + {k * S_CUST} AS o_custkey,
               o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        FROM {t('orders')}""")
    build("lineitem", lambda k: f"""
        SELECT l_orderkey + {k * S_ORDER} AS l_orderkey,
               l_partkey + {k * S_PART} AS l_partkey,
               l_suppkey + {k * S_SUPP} AS l_suppkey,
               l_linenumber, l_quantity, l_extendedprice, l_discount,
               l_tax, l_returnflag, l_linestatus, l_shipdate
        FROM {t('lineitem')}""")
    build("customer", lambda k: f"""
        SELECT c_custkey + {k * S_CUST} AS c_custkey,
               c_name, c_nationkey, c_acctbal, c_mktsegment
        FROM {t('customer')}""")
    build("part", lambda k: f"""
        SELECT p_partkey + {k * S_PART} AS p_partkey,
               p_name, p_brand, p_type, p_size, p_retailprice
        FROM {t('part')}""")
    build("supplier", lambda k: f"""
        SELECT s_suppkey + {k * S_SUPP} AS s_suppkey,
               s_name, s_nationkey, s_acctbal
        FROM {t('supplier')}""")
    build("events", lambda k: f"""
        SELECT event_id + {k * S_EVENT} AS event_id, ts,
               user_id + {k * S_USER} AS user_id,
               event_type, value, props
        FROM {t('events')}""")

    def doc_sel(k):
        if k == 0:
            return f"SELECT doc_id, text, lang, source, n_chars FROM {t('documents')}"
        frm, to = caesar(k)
        return f"""
        SELECT doc_id + {k * S_DOC} AS doc_id,
               translate(text, '{frm}', '{to}') AS text,
               lang, source, n_chars
        FROM {t('documents')}"""
    build("documents", doc_sel)

    def emb_sel(k):
        r = k % 64
        rot = ("embedding" if r == 0 else
               f"list_concat(embedding[{r + 1}:64], embedding[1:{r}])"
               f"::FLOAT[]")
        return f"""
        SELECT vec_id + {k * S_VEC} AS vec_id,
               {rot} AS embedding, label
        FROM {t('embeddings')}"""
    build("embeddings", emb_sel)

    for name in ["nation", "region"]:
        con.execute(f"COPY (SELECT * FROM {t(name)}) "
                    f"TO '{OUT}/{name}.parquet' (FORMAT PARQUET)")
        print(f"[sf1] {name}: copied")
    with open(f"{OUT}/_factor", "w") as f:
        f.write(f"{FACTOR} replica-universe v1\n")
    print(f"[sf1] done -> {OUT}")


if __name__ == "__main__":
    main()
