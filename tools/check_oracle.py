#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL in
DuckDB against the sf parquet tables and compare (exactly) with the parquet
results Verify wrote. Usage: check_oracle.py <sfDir> <verifyOutDir>
[qname,qname,...] — the optional third arg restricts the replay (comma list,
each matched as a prefix), for the ×10 hash-continuity ritual where a
handful of targeted oracles matter and the heavyweight full-corpus SQLs
(q25's LSH replay at 50k docs) would dominate the wall."""
import sys, json, glob, os
import duckdb

sf_dir, out_dir = sys.argv[1], sys.argv[2]
only = [s for s in (sys.argv[3].split(",") if len(sys.argv) > 3 else []) if s]
con = duckdb.connect()
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(p)[:-8]
    # ScaleUp dirs are Spark-style directories of part files
    src = f"{p}/*.parquet" if os.path.isdir(p) else p
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{src}')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
if only:
    oracle = {k: v for k, v in oracle.items()
              if any(k.startswith(p) for p in only)}
    # a filter that matches nothing must not read as a vacuous pass
    unmatched = [p for p in only if not any(k.startswith(p) for k in oracle)]
    if unmatched or not oracle:
        print(f"FILTER   no oracle matches prefixes {unmatched or only}")
        sys.exit(1)
fail = 0
for name, sql in sorted(oracle.items()):
    res_dir = f"{out_dir}/{name}"
    if not os.path.isdir(res_dir):
        print(f"MISSING  {name}: no result dir"); fail += 1; continue
    try:
        got = con.execute(
            f"SELECT * FROM read_parquet('{res_dir}/*.parquet')").fetchdf()
        want = con.execute(sql).fetchdf()
    except Exception as e:
        print(f"ERROR    {name}: {e}"); fail += 1; continue
    gc, wc = sorted(got.columns), sorted(want.columns)
    if gc != wc:
        print(f"SCHEMA   {name}: got {gc} want {wc}"); fail += 1; continue
    g = got[gc].sort_values(gc).reset_index(drop=True)
    w = want[wc].sort_values(wc).reset_index(drop=True)
    if len(g) != len(w):
        print(f"ROWS     {name}: got {len(g)} want {len(w)}"); fail += 1; continue
    # exact value compare (driver hashes values)
    diffs = []
    for c in gc:
        a, b = g[c], w[c]
        neq = ~((a == b) | (a.isna() & b.isna()))
        if neq.any():
            i = neq.idxmax()
            diffs.append(f"col {c} row {i}: got {a[i]!r} want {b[i]!r} "
                         f"({neq.sum()} diffs)")
    if diffs:
        print(f"VALUES   {name}: " + "; ".join(diffs)); fail += 1
    else:
        print(f"OK       {name} ({len(g)} rows)")
print(f"\n{len(oracle) - fail}/{len(oracle)} queries match")
sys.exit(1 if fail else 0)
