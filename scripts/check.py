#!/usr/bin/env python3
"""Local correctness checker mimicking the driver's DuckDB-oracle gate.

Usage: python3 scripts/check.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/oracle_sql.json (written by graft.Verify), runs each
oracle against DuckDB views over <sfDir>/*.parquet, and compares with the
Spark result parquet at <verifyOutDir>/<name>/. Columns are sorted by
name before comparison (driver behavior); rows compared both in file
order and sorted. Dev tool only — not part of the shipped library.
"""
import duckdb, glob, json, sys

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    # stringify everything for an order/dtype-insensitive value compare
    return df.astype(str)

def sort_rows(df):
    # Driver behavior: rows are sorted on the RAW columns (before any
    # stringify), so an unsortable cell type (e.g. a numpy array from a
    # Spark array column) crashes there. Reproduce that here so queries
    # that would fail the driver gate fail this pre-flight too.
    raw = df.sort_values(by=list(df.columns))
    return raw.astype(str).values.tolist()

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    # optional 3rd+ args: selectors applied in order. Each is either
    #   "i/k"     — keep every k-th query (fan the replay across
    #               parallel processes at big SFs),
    #   "p1,p2"   — keep only names with one of these prefixes, or
    #   "!p1,p2"  — DROP names with one of these prefixes (run heavy
    #               stragglers in their own processes, keep them out
    #               of the sharded fleet: `!q90,q130 0/8` ... `7/8`).
    selectors = sys.argv[3:]
    con = duckdb.connect()
    # DUCKDB_THREADS caps the oracle's thread pool so several sharded
    # replay processes can share one box without thrashing
    nthreads = __import__('os').environ.get("DUCKDB_THREADS")
    if nthreads:
        con.sql(f"SET threads TO {int(nthreads)}")
    # DUCKDB_MEMLIMIT (e.g. "40GB") makes oracle hash joins spill to
    # disk instead of OOM-killing the process at sf1 pair volumes
    memlim = __import__('os').environ.get("DUCKDB_MEMLIMIT")
    if memlim:
        con.sql(f"SET memory_limit = '{memlim}'")
        con.sql("SET temp_directory = '/tmp/duckdb_spill'")
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    for shard in selectors:
        if "/" in shard:
            i, k = map(int, shard.split("/"))
            if k <= 0 or not (0 <= i < k):
                sys.exit(f"bad shard selector '{shard}': need 0 <= i < k, k > 0")
            names = sorted(oracle)
            oracle = {n: oracle[n] for j, n in enumerate(names) if j % k == i}
        elif shard.startswith("!"):
            ps = shard[1:].split(",")
            oracle = {n: s for n, s in oracle.items()
                      if not any(n.startswith(p) for p in ps)}
        else:
            ps = shard.split(",")
            oracle = {n: s for n, s in oracle.items()
                      if any(n.startswith(p) for p in ps)}
    if selectors and not oracle:
        sys.exit(f"selectors {selectors} chose zero queries — nothing to check")
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark result parquet"); n_fail += 1; continue
        try:
            exp = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {str(e)[:200]}"); n_fail += 1; continue
        got = con.sql(
            f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')").df()
        g, e = norm(got), norm(exp)
        if g.shape != e.shape:
            print(f"FAIL {name}: shape {g.shape} vs oracle {e.shape}"); n_fail += 1; continue
        if list(g.columns) != list(e.columns):
            print(f"FAIL {name}: cols {list(g.columns)} vs {list(e.columns)}"); n_fail += 1; continue
        try:
            gs = sort_rows(got.reindex(sorted(got.columns), axis=1))
            es = sort_rows(exp.reindex(sorted(exp.columns), axis=1))
        except Exception as ex:
            print(f"FAIL {name}: driver-style raw sort crashed "
                  f"(unsortable column type?): {str(ex)[:150]}")
            n_fail += 1; continue
        if g.values.tolist() == e.values.tolist():
            print(f"PASS {name} ({g.shape[0]} rows)"); n_pass += 1; continue
        if gs == es:
            print(f"PASS {name} ({g.shape[0]} rows) [row order differs]"); n_pass += 1
        else:
            diffs = [i for i, (a, b) in enumerate(zip(gs, es)) if a != b][:3]
            print(f"FAIL {name}: values differ; first diff rows {diffs}")
            for i in diffs[:2]:
                print(f"  spark:  {gs[i]}")
                print(f"  oracle: {es[i]}")
            n_fail += 1
    print(f"\n{n_pass} passed, {n_fail} failed, {len(oracle)} total")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
