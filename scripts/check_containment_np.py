#!/usr/bin/env python3
"""Containment-dedup oracle replica with vectorized pair generation.

The SQL oracle for q120_containment / q209_containment_capped replays
the df-capped two-stage plan (cold-shingle candidates, exact full-set
verify) in pure DuckDB; at sf1 the candidate self-join + per-pair
list_intersect verify grinds for hours (the r14 SCALE.md straggler).
This checker replays the IDENTICAL semantics with the linear, per-doc
stages (corpus build, tokenize, 3-token shingles, distinct) still in
DuckDB — literally the oracle's own CTE text up to the posting list —
and only the quadratic stages swapped for vectorized numpy:

  - shingles get dense integer ids in DuckDB (exact string identity,
    no hashing anywhere);
  - df = bincount over posting sids; cold = df <= cap;
  - candidate pairs = per-cold-shingle triu index pairs, packed into
    int64, deduped with np.unique — the same Sigma df^2 work the SQL
    cand CTE does, at C speed;
  - verify = np.intersect1d of the two docs' full sorted sid arrays
    (full sets, not just cold — exactly the oracle's list_intersect);
  - containments in integer ppm floor-div, threshold >= 800000.

Then compares against the engine dump exactly like check.py (columns
sorted by name, rows sorted, stringified). Validate at sf0.01 with
--vs-oracle (runs the pure-SQL oracle text from the dump's
oracle_sql.json and diffs replica vs oracle row-exact) before trusting
an sf1 run. Dev tool only — the driver's sf0.01 gate still runs the
pure-SQL oracle.

Usage: check_containment_np.py <sfDir> <verifyOutDir>
         [--query q120_containment] [--cap 128] [--vs-oracle]
"""
import sys
import duckdb
import numpy as np
import pandas as pd

TOK = r"regexp_split_to_array(trim(text), '\s+')"
SHINGLES3 = "[array_to_string(ts[i:i+2], ' ') for i in range(1, len(ts) - 1)]"
CORPUS = ("SELECT doc_id, text FROM documents UNION ALL "
          "SELECT a.doc_id + 2000000, a.text || ' ' || b.text "
          "FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1 "
          "WHERE a.doc_id % 10 = 0")
THRESHOLD_PPM = 800000


def replica(con, cap):
    # linear per-doc stages: the oracle's own CTE text, stopping at the
    # posting list; shingle strings -> dense sids for exact identity
    con.sql(f"""CREATE TEMP TABLE p AS
      WITH corpus AS ({CORPUS}),
      tok AS (SELECT doc_id AS id, {TOK} AS ts FROM corpus),
      shr AS (SELECT id, {SHINGLES3} AS shr FROM tok),
      sh AS (SELECT id, list_distinct(shr) AS sh FROM shr WHERE len(shr) > 0)
      SELECT id, unnest(sh) AS s FROM sh""")
    con.sql("""CREATE TEMP TABLE sid AS
      SELECT s, row_number() OVER (ORDER BY s) AS sid
      FROM (SELECT DISTINCT s FROM p)""")
    cols = con.sql(
        "SELECT p.id, sid.sid FROM p JOIN sid USING (s)").fetchnumpy()
    ids = cols["id"].astype(np.int64)
    sids = cols["sid"].astype(np.int64)

    # per-doc FULL shingle sets (sorted sid arrays) for the verify stage
    order = np.argsort(ids, kind="stable")
    ids_o, sids_o = ids[order], sids[order]
    doc_ids, doc_starts = np.unique(ids_o, return_index=True)
    doc_bounds = np.append(doc_starts, len(ids_o))
    doc_pos = {d: k for k, d in enumerate(doc_ids)}
    doc_sets = [np.sort(sids_o[doc_bounds[k]:doc_bounds[k + 1]])
                for k in range(len(doc_ids))]
    doc_len = np.array([len(a) for a in doc_sets], dtype=np.int64)

    # df + cold postings + per-shingle candidate pairs (Sigma df^2)
    sorder = np.argsort(sids, kind="stable")
    s_s, s_i = sids[sorder], ids[sorder]
    u_s, s_starts = np.unique(s_s, return_index=True)
    s_bounds = np.append(s_starts, len(s_s))
    chunks = []
    for k in range(len(u_s)):
        lo, hi = s_bounds[k], s_bounds[k + 1]
        df = hi - lo
        if df < 2 or df > cap:
            continue
        members = np.sort(s_i[lo:hi])
        ia, ib = np.triu_indices(df, k=1)
        chunks.append(members[ia] * (1 << 32) + members[ib])
    if not chunks:
        return pd.DataFrame(columns=["id_a", "id_b", "shared", "a_sh",
                                     "b_sh", "cont_a_q", "cont_b_q"])
    cand = np.unique(np.concatenate(chunks))
    a = (cand >> 32).astype(np.int64)
    b = (cand & ((1 << 32) - 1)).astype(np.int64)

    rows = []
    for id_a, id_b in zip(a, b):
        sa = doc_sets[doc_pos[id_a]]
        sb = doc_sets[doc_pos[id_b]]
        shared = np.intersect1d(sa, sb, assume_unique=True).size
        a_sh = int(doc_len[doc_pos[id_a]])
        b_sh = int(doc_len[doc_pos[id_b]])
        ca = shared * 1000000 // a_sh
        cb = shared * 1000000 // b_sh
        if max(ca, cb) >= THRESHOLD_PPM:
            rows.append((int(id_a), int(id_b), int(shared),
                         a_sh, b_sh, ca, cb))
    return pd.DataFrame(rows, columns=["id_a", "id_b", "shared", "a_sh",
                                       "b_sh", "cont_a_q", "cont_b_q"])


def norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.astype(str)
    return df.sort_values(by=list(df.columns)).values.tolist()


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sfdir, outdir = args[0], args[1]
    query = "q120_containment"
    cap = 128
    argv = sys.argv[1:]
    if "--query" in argv:
        query = argv[argv.index("--query") + 1]
    if "--cap" in argv:
        cap = int(argv[argv.index("--cap") + 1])
    con = duckdb.connect()
    con.sql(f"""CREATE VIEW documents AS
      SELECT * FROM read_parquet('{sfdir}/documents.parquet')""")
    exp = replica(con, cap)
    if "--vs-oracle" in argv:
        import json
        sql = json.load(open(f"{outdir}/oracle_sql.json"))[query]
        oracle = con.sql(sql).df()
        if norm(exp) == norm(oracle):
            print(f"REPLICA==ORACLE for {query} ({len(exp)} rows)")
        else:
            print(f"REPLICA!=ORACLE for {query}: "
                  f"{len(exp)} vs {len(oracle)} rows")
            sys.exit(1)
    got = con.sql(
        f"SELECT * FROM read_parquet('{outdir}/{query}/*.parquet')").df()
    g, e = norm(got), norm(exp)
    if g == e:
        print(f"PASS {query} via np replica ({len(g)} rows, cap {cap})")
    else:
        diffs = sum(1 for x, y in zip(g, e) if x != y)
        print(f"FAIL {query}: {diffs} differing rows of {len(g)} vs {len(e)}")
        sys.exit(1)


if __name__ == "__main__":
    main()
