#!/usr/bin/env python3
"""Scale-up generator: replicate /root/testdata/sf0.1 K-fold (default 10x
== "sf1") with FK-consistent key offsets, for empirical scale runs of
graft.Bench. Dev tool only (the check.py/duckdb tier) — not part of the
shipped library; the driver's testdata stays read-only and untouched.

Key discipline per copy i (0 = verbatim original):
  customer  c_custkey  += i*15000   (name regenerated from the new key,
  supplier  s_suppkey  += i*1000     so name<->key stays bijective and
                                     q90's edit-distance density scales
                                     linearly, not quadratically)
  part      p_partkey  += i*20000
  orders    o_orderkey += i*150000, o_custkey follows customer
  lineitem  all three FKs follow their parents
  events    event_id   += i*100000, user_id += i*(max_user+1)
  documents doc_id     += i*5000; copies get a 'copyN ' prefix token so
            dedup tiers see realistic NEAR-duplicate clusters instead of
            degenerate exact clones; n_chars recomputed
  embeddings vec_id    += i*2000; components get a small deterministic
            per-copy, per-dimension jitter so ANN clusters are near, not
            identical
  region/nation: fixed dims, copied once

Usage: python3 scripts/gen_scale.py [K] [outdir]
       defaults: K=10 outdir=/root/repo/testdata/sf1
"""
import os, sys, duckdb

K = int(sys.argv[1]) if len(sys.argv) > 1 else 10
OUT = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/testdata/sf1"
SRC = "/root/testdata/sf0.1"
os.makedirs(OUT, exist_ok=True)
con = duckdb.connect()
con.sql(f"CREATE VIEW g AS SELECT unnest(range({K})) AS i")

def copy(table, select):
    src = f"read_parquet('{SRC}/{table}.parquet')"
    con.sql(f"COPY ({select.format(src=src)}) TO '{OUT}/{table}.parquet' (FORMAT PARQUET)")
    n = con.sql(f"SELECT count(*) FROM read_parquet('{OUT}/{table}.parquet')").fetchone()[0]
    print(f"{table}: {n} rows")

copy("region", "SELECT * FROM {src}")
copy("nation", "SELECT * FROM {src}")
copy("customer", """
  SELECT c_custkey + i*15000 AS c_custkey,
         'Customer#' || lpad(CAST(c_custkey + i*15000 AS VARCHAR), 9, '0') AS c_name,
         c_nationkey, c_acctbal, c_mktsegment
  FROM {src}, g""")
copy("supplier", """
  SELECT s_suppkey + i*1000 AS s_suppkey,
         'Supplier#' || lpad(CAST(s_suppkey + i*1000 AS VARCHAR), 9, '0') AS s_name,
         s_nationkey, s_acctbal
  FROM {src}, g""")
copy("part", """
  SELECT p_partkey + i*20000 AS p_partkey, p_name, p_brand, p_type, p_size,
         p_retailprice
  FROM {src}, g""")
copy("orders", """
  SELECT o_orderkey + i*150000 AS o_orderkey, o_custkey + i*15000 AS o_custkey,
         o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
  FROM {src}, g""")
copy("lineitem", """
  SELECT l_orderkey + i*150000 AS l_orderkey, l_partkey + i*20000 AS l_partkey,
         l_suppkey + i*1000 AS l_suppkey, l_linenumber, l_quantity,
         l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus,
         l_shipdate
  FROM {src}, g""")
umax = con.sql(f"SELECT max(user_id) + 1 FROM read_parquet('{SRC}/events.parquet')").fetchone()[0]
copy("events", f"""
  SELECT event_id + i*100000 AS event_id, ts, user_id + i*{umax} AS user_id,
         event_type, value, props
  FROM {{src}}, g""")
copy("documents", """
  SELECT doc_id + i*5000 AS doc_id,
         CASE WHEN i = 0 THEN text ELSE 'copy' || i || ' ' || text END AS text,
         lang, source,
         CAST(length(CASE WHEN i = 0 THEN text ELSE 'copy' || i || ' ' || text END) AS BIGINT) AS n_chars
  FROM {src}, g""")
copy("embeddings", """
  SELECT vec_id + i*2000 AS vec_id,
         CAST(list_transform(list_zip(embedding, range(1, len(embedding) + 1)),
           z -> z[1] + 0.003 * i * ((z[2] % 5) - 2)) AS FLOAT[]) AS embedding,
         label
  FROM {src}, g""")
print(f"done -> {OUT} (K={K})")
