#!/usr/bin/env python3
"""Skewed-scale generator: gen_scale.py's K-fold replication with
deliberately Zipfian hot keys injected, for benching the skew machinery
(ScaleOps.saltedSum, SkewJoin.saltedEquiJoin, AQE skew-join) against
data that actually has a hot key — the uniform sf1 replication never
stressed it (VERDICT r10 #4). Dev tool only (bench tier); never
oracle-gated — the skew corpus exists to measure, not to verify.

Injected skew (all deterministic, on top of the sf1 key discipline):
  orders     ~10% of ALL orders reassigned to customer 1 (the "whale"
             account: one customer owning a tenth of the order book)
  lineitem   ~10% of rows reassigned to supplier 1 (a super-hub node in
             the supplier↔part graph tier)
  customer   ~5% of REPLICA customers share the literal name
             'Customer#000000001' → one giant deletion-neighborhood
             block for the fuzzy-join/record-linkage tier
  events     ~10% of events reassigned to user 1 (one giant per-user
             window partition for sessions/sequences)
  documents  ~30% of docs get one shared trailing hot token (boilerplate
             shingle with df ≈ 0.3·N — the df-cap's target regime)
  embeddings ~10% of vectors collapsed near vector 1 (one giant IVF
             cell / SRP bucket)

Usage: python3 scripts/gen_skew.py [K] [outdir]
       defaults: K=10 outdir=/root/repo/testdata/sf1skew
"""
import os, sys, duckdb

K = int(sys.argv[1]) if len(sys.argv) > 1 else 10
OUT = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/testdata/sf1skew"
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
# ~5% of replica customers collapse onto ONE name (key stays unique)
copy("customer", """
  SELECT c_custkey + i*15000 AS c_custkey,
         CASE WHEN i > 0 AND c_custkey % 20 = 0
              THEN 'Customer#000000001'
              ELSE 'Customer#' || lpad(CAST(c_custkey + i*15000 AS VARCHAR), 9, '0')
         END AS c_name,
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
# the whale: every 10th order belongs to customer 1
copy("orders", """
  SELECT o_orderkey + i*150000 AS o_orderkey,
         CASE WHEN (o_orderkey + i*150000) % 10 = 0 THEN 1
              ELSE o_custkey + i*15000 END AS o_custkey,
         o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
  FROM {src}, g""")
# the hub supplier: every 10th lineitem ships from supplier 1
copy("lineitem", """
  SELECT l_orderkey + i*150000 AS l_orderkey, l_partkey + i*20000 AS l_partkey,
         CASE WHEN (l_orderkey + i*150000 + l_linenumber) % 10 = 0 THEN 1
              ELSE l_suppkey + i*1000 END AS l_suppkey,
         l_linenumber, l_quantity,
         l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus,
         l_shipdate
  FROM {src}, g""")
umax = con.sql(f"SELECT max(user_id) + 1 FROM read_parquet('{SRC}/events.parquet')").fetchone()[0]
# the hyperactive user: every 10th event is user 1's
copy("events", f"""
  SELECT event_id + i*100000 AS event_id, ts,
         CASE WHEN (event_id + i*100000) % 10 = 0 THEN 1
              ELSE user_id + i*{umax} END AS user_id,
         event_type, value, props
  FROM {{src}}, g""")
# the boilerplate token: ~30% of docs end with the same word
copy("documents", """
  SELECT doc_id + i*5000 AS doc_id,
         CASE WHEN i = 0 THEN text ELSE 'copy' || i || ' ' || text END
           || CASE WHEN (doc_id + i*5000) % 10 < 3
                   THEN ' boilerplateskewtok' ELSE '' END AS text,
         lang, source,
         CAST(length(CASE WHEN i = 0 THEN text ELSE 'copy' || i || ' ' || text END
           || CASE WHEN (doc_id + i*5000) % 10 < 3
                   THEN ' boilerplateskewtok' ELSE '' END) AS BIGINT) AS n_chars
  FROM {src}, g""")
# the megacluster: every 10th vector collapses near vector 1's position
hot = con.sql(
    f"SELECT embedding FROM read_parquet('{SRC}/embeddings.parquet') WHERE vec_id = 1"
).fetchone()[0]
hot_sql = "[" + ", ".join(f"CAST({x} AS FLOAT)" for x in hot) + "]"
copy("embeddings", f"""
  SELECT vec_id + i*2000 AS vec_id,
         CASE WHEN (vec_id + i*2000) % 10 = 0 THEN
           CAST(list_transform(list_zip({hot_sql}, range(1, len(embedding) + 1)),
             z -> z[1] + 0.0001 * ((vec_id + i*2000) % 97) * ((z[2] % 5) - 2))
             AS FLOAT[])
         ELSE
           CAST(list_transform(list_zip(embedding, range(1, len(embedding) + 1)),
             z -> z[1] + 0.003 * i * ((z[2] % 5) - 2)) AS FLOAT[])
         END AS embedding,
         label
  FROM {{src}}, g""")
print(f"done -> {OUT} (K={K}, skewed)")
