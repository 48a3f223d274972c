#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify, then
run each oracle SQL in DuckDB over the same tables and compare (columns
sorted by name, row order preserved, exact value equality).

Usage: python3 tools/check.py [sfDir] [outDir] [--skip-verify] [query ...]
"""
import json, subprocess, sys, glob, os

sf = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith('-') else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 and not sys.argv[2].startswith('-') else "/tmp/verify_out"
skip = '--skip-verify' in sys.argv
only = [a for a in sys.argv[3:] if not a.startswith('-')]

if not skip:
    r = subprocess.run(
        ["sbt", "-batch", f'runMain graft.Verify {sf} {out}'],
        cwd="/root/repo", capture_output=True, text=True, timeout=1800)
    sys.stdout.write('\n'.join(l for l in r.stdout.splitlines()
                               if 'error' in l.lower() or 'failed' in l.lower()) + '\n')
    if r.returncode != 0:
        print(r.stdout[-3000:]); print(r.stderr[-3000:]); sys.exit(1)

import duckdb
import pandas as pd
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

oracle = json.load(open(f"{out}/oracle_sql.json"))
ok = fail = 0
for name, sql in sorted(oracle.items()):
    if only and name not in only:
        continue
    files = glob.glob(f"{out}/{name}/*.parquet")
    if not files:
        print(f"FAIL {name}: no result parquet"); fail += 1; continue
    try:
        got = con.sql(f"SELECT * FROM '{files[0]}'").df()
        exp = con.sql(sql).df()
    except Exception as e:
        print(f"FAIL {name}: {e}"); fail += 1; continue
    got = got[sorted(got.columns)]
    exp = exp[sorted(exp.columns)]
    if list(got.columns) != list(exp.columns):
        print(f"FAIL {name}: columns {list(got.columns)} vs {list(exp.columns)}")
        fail += 1; continue
    if len(got) != len(exp):
        print(f"FAIL {name}: rows {len(got)} vs {len(exp)}"); fail += 1; continue
    bad = None
    for c in got.columns:
        g, e = got[c], exp[c]
        if str(g.dtype).startswith('datetime') or str(e.dtype).startswith('datetime'):
            g = pd.to_datetime(g).astype('datetime64[us]')
            e = pd.to_datetime(e).astype('datetime64[us]')
        neq = ~((g == e) | (g.isna() & e.isna()))
        if neq.any():
            i = neq.idxmax()
            bad = (c, i, g[i], e[i], int(neq.sum()))
            break
    if bad:
        c, i, gv, ev, n = bad
        print(f"FAIL {name}: col {c} row {i}: got {gv!r} want {ev!r} ({n} diffs)")
        fail += 1
    else:
        print(f"ok   {name} ({len(got)} rows)")
        ok += 1
print(f"\n{ok} ok, {fail} fail")
sys.exit(1 if fail else 0)
