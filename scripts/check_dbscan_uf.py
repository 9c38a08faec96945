#!/usr/bin/env python3
"""Exact DBSCAN oracle replica with union-find connected components.

The SQL oracle (Dbscan.dbscanOracleSql) computes core-graph components
with a RECURSIVE CTE that carries (node, source-label) pairs — O(V^2)
state inside dense components, which grinds for hours at sf1. This
checker replays the IDENTICAL semantics (same eps/minPts, same
min-core-id cluster labels, same core/border/noise roles) with the
pair-join and degree counting still in DuckDB and only the transitive
closure swapped for union-find; it then compares against the engine
dump exactly like check.py (columns sorted by name, rows sorted,
stringified). Dev tool only — the driver's sf0.01 gate still runs the
pure-SQL oracle.

Usage: check_dbscan_uf.py <sfDir> <verifyOutDir> [eps] [minPts]
"""
import sys, glob
import duckdb

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    eps = int(sys.argv[3]) if len(sys.argv) > 3 else 150
    minpts = int(sys.argv[4]) if len(sys.argv) > 4 else 5
    con = duckdb.connect()
    src = f"""SELECT vec_id AS id,
      CAST(floor(CAST(embedding[1] AS DOUBLE) * 10000) AS BIGINT) AS x,
      CAST(floor(CAST(embedding[2] AS DOUBLE) * 10000) AS BIGINT) AS y
      FROM read_parquet('{sfdir}/embeddings.parquet')"""
    pts = con.sql(src).fetchall()
    pairs = con.sql(f"""WITH pts AS ({src})
      SELECT a.id, b.id FROM pts a JOIN pts b ON a.id < b.id
        AND (a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y) <= {eps}*{eps}
      """).fetchall()
    deg = {pid: 1 for pid, _, _ in pts}  # nbrs includes self (+1)
    for a, b in pairs:
        deg[a] += 1; deg[b] += 1
    core = {pid for pid in deg if deg[pid] >= minpts}
    # union-find over core-core edges
    parent = {}
    def find(x):
        r = x
        while parent.get(r, r) != r: r = parent[r]
        while parent.get(x, x) != x: parent[x], x = r, parent[x]
        return r
    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb: parent[max(ra, rb)] = min(ra, rb)
    for a, b in pairs:
        if a in core and b in core: union(a, b)
    cluster = {c: find(c) for c in core}  # min core id per component
    # one more pass: path compression may leave stale roots; re-resolve
    cluster = {c: find(c) for c in core}
    border = {}
    for a, b in pairs:
        if a not in core and b in core:
            border[a] = min(border.get(a, cluster[b]), cluster[b])
        if b not in core and a in core:
            border[b] = min(border.get(b, cluster[a]), cluster[a])
    rows = []
    for pid, x, y in pts:
        if pid in core:
            role, cl = "core", cluster[pid]
        elif pid in border:
            role, cl = "border", border[pid]
        else:
            role, cl = "noise", None
        rows.append((pid, x, y, deg[pid], role, cl))
    import pandas as pd
    exp = pd.DataFrame(rows,
        columns=["id", "x", "y", "nbrs", "role", "cluster"])
    got = con.sql(
        f"SELECT * FROM read_parquet('{outdir}/q231_dbscan/*.parquet')").df()
    def norm(df):
        df = df.reindex(sorted(df.columns), axis=1)
        # nullable-int discipline: the engine dump reads cluster as
        # float64-with-NaN, the replica builds python ints/None — both
        # go through Int64 so '123'=='123' and missing prints '<NA>'
        df["cluster"] = df["cluster"].astype("Int64")
        df = df.astype(str)
        return df.sort_values(by=list(df.columns)).values.tolist()
    g, e = norm(got), norm(exp)
    if g == e:
        print(f"PASS q231_dbscan via union-find replica ({len(g)} rows)")
    else:
        diffs = sum(1 for a, b in zip(g, e) if a != b)
        print(f"FAIL q231_dbscan: {diffs} differing rows of {len(g)} vs {len(e)}")
        sys.exit(1)

if __name__ == "__main__":
    main()
