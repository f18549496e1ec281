#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify via
sbt, then run each oracle SQL in DuckDB over the same parquet tables and
compare row counts, schemas (column names), and value hashes.

Usage: python3 tools/check.py [sfDir] [--only q13_pip_join,...]
"""
import duckdb, glob, json, math, os, subprocess, sys

sf = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("--") else "/root/testdata/sf0.01"
only = None
for a in sys.argv:
    if a.startswith("--only"):
        only = a.split("=")[1].split(",") if "=" in a else None
out = "/tmp/graft_verify"

rc = subprocess.run(
    ["sbt", "-batch", f'runMain graft.Verify {sf} {out}'],
    capture_output=True, text=True, cwd="/root/repo")
if rc.returncode != 0:
    print(rc.stdout[-4000:]); print(rc.stderr[-4000:]); sys.exit(1)

oracle = json.load(open(f"{out}/oracle_sql.json"))
con = duckdb.connect()
for tbl in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    p = f"{sf}/{tbl}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {tbl} AS SELECT * FROM read_parquet('{p}')")

def norm(v):
    if v is None: return "NULL"
    if isinstance(v, float):
        if math.isnan(v): return "NaN"
        return f"{v:.10g}"
    return str(v)

fails = 0
for name in sorted(oracle):
    if only and name not in only: continue
    files = glob.glob(f"{out}/{name}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output"); fails += 1; continue
    got = con.execute(f"SELECT * FROM read_parquet('{files[0]}')").fetchall()
    got_cols = [d[0] for d in con.execute(f"SELECT * FROM read_parquet('{files[0]}') LIMIT 0").description]
    try:
        res = con.execute(oracle[name])
        exp_cols = [d[0] for d in res.description]
        exp = res.fetchall()
    except Exception as e:
        print(f"FAIL {name}: oracle error: {e}"); fails += 1; continue
    # sort columns by name, then rows
    def canon(rows, cols):
        order = sorted(range(len(cols)), key=lambda i: cols[i])
        return sorted(tuple(norm(r[i]) for i in order) for r in rows)
    if sorted(got_cols) != sorted(exp_cols):
        print(f"FAIL {name}: cols spark={sorted(got_cols)} oracle={sorted(exp_cols)}"); fails += 1; continue
    g, e = canon(got, got_cols), canon(exp, exp_cols)
    if len(g) != len(e):
        print(f"FAIL {name}: rows spark={len(g)} oracle={len(e)}")
        for i,(a,b) in enumerate(zip(g,e)):
            if a!=b: print("  first diff", i, a, b); break
        fails += 1; continue
    if g != e:
        diffs = [(a,b) for a,b in zip(g,e) if a!=b]
        print(f"FAIL {name}: {len(diffs)} value diffs; first: {diffs[0]}")
        fails += 1; continue
    print(f"PASS {name} ({len(g)} rows)")
print("ALL PASS" if fails == 0 else f"{fails} FAILURES")
sys.exit(1 if fails else 0)
