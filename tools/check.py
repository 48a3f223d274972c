#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify, then
run each oracle SQL in DuckDB over the same tables and compare (columns
sorted by name, row order preserved).

Floats compare with a small absolute tolerance (both engines round() their
aggregates, but last-bit summation-order differences can straddle a
rounding boundary); everything else compares exactly.

Usage: python3 tools/check.py [--sf DIR] [--out DIR] [--skip-verify] [query ...]
       (bare positional dir args still accepted for compatibility)
"""
import argparse, json, subprocess, sys, glob, os, shutil

ap = argparse.ArgumentParser()
ap.add_argument("--sf", default=None, help="scale-factor data dir")
ap.add_argument("--out", default=None, help="verify output dir")
ap.add_argument("--skip-verify", action="store_true",
                help="reuse the existing output dir instead of re-running Verify")
ap.add_argument("--atol", type=float, default=1e-6, help="float comparison tolerance")
ap.add_argument("rest", nargs="*",
                help="optional: positional sfDir/outDir (if they look like dirs) and query-name filters")
args = ap.parse_args()

rest = list(args.rest)
sf = args.sf
out = args.out
# legacy positionals: first arg starting with '/' is sfDir, second is outDir
if sf is None and rest and rest[0].startswith("/"):
    sf = rest.pop(0)
if out is None and rest and rest[0].startswith("/"):
    out = rest.pop(0)
sf = sf or "/root/testdata/sf0.01"
out = out or "/tmp/verify_out"
only = rest

verify_errors = []
if not args.skip_verify:
    # fresh output dir: stale parquet from an earlier run must never be
    # compared (false-green risk)
    if only:
        for q in only:
            shutil.rmtree(os.path.join(out, q), ignore_errors=True)
    else:
        shutil.rmtree(out, ignore_errors=True)
    r = subprocess.run(
        ["sbt", "-batch", f'runMain graft.Verify {sf} {out}'],
        cwd="/root/repo", capture_output=True, text=True, timeout=1800)
    for line in (r.stdout + r.stderr).splitlines():
        if "[verify]" in line and "failed" in line:
            verify_errors.append(line[line.index("[verify]"):])
    interesting = [l for l in r.stdout.splitlines()
                   if 'error' in l.lower() or 'failed' in l.lower()]
    if interesting:
        sys.stdout.write('\n'.join(interesting) + '\n')
    if r.returncode != 0:
        print(r.stdout[-3000:]); print(r.stderr[-3000:]); sys.exit(1)

import duckdb
import pandas as pd
import numpy as np
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

def type_class(t):
    """Collapse a DuckDB type name to the class the driver's exact hash
    renders distinctly: decimal values render with trailing zeros
    ('1.0000'), floats don't ('1.0'), ints have no point at all."""
    t = t.upper()
    if t.startswith("DECIMAL"):
        return "decimal"
    if t in ("FLOAT", "DOUBLE", "REAL"):
        return "float"
    if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT", "HUGEINT",
             "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT", "UHUGEINT"):
        return "int"
    return None  # other classes: pandas value compare is authoritative

def result_types(con, query):
    return {r[0]: r[1] for r in con.sql(f"DESCRIBE {query}").fetchall()}

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
        got_t = result_types(con, f"SELECT * FROM '{files[0]}'")
        exp_t = result_types(con, f"({sql})")
    except Exception as e:
        print(f"FAIL {name}: {e}"); fail += 1; continue
    # the driver hashes RENDERED values, so a numeric-class divergence
    # (decimal '1.0000' vs double '1.0', int '1' vs double '1.0') fails
    # there even when the values compare equal here — flag it pre-values
    tmis = [(c, got_t[c], exp_t[c]) for c in sorted(set(got_t) & set(exp_t))
            if type_class(got_t[c]) is not None
            and type_class(exp_t[c]) is not None
            and type_class(got_t[c]) != type_class(exp_t[c])
            # HUGEINT-vs-BIGINT style width drift inside one class is fine;
            # int-vs-int only differs in width
            ]
    if tmis:
        for c, gt, et in tmis:
            print(f"FAIL {name}: col {c} dtype class {gt} vs oracle {et} "
                  f"(driver hashes rendered values — would mismatch)")
        fail += 1; continue
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
        if (g.dtype.kind in 'iu') != (e.dtype.kind in 'iu'):
            # the driver's comparer is an exact hash: int64 123 vs float64
            # 123.0 (e.g. DuckDB sum(BIGINT) -> HUGEINT -> float) mismatches
            bad = (c, 'dtype', str(g.dtype), str(e.dtype), -1)
            break
        if g.dtype.kind == 'f' or e.dtype.kind == 'f':
            gg = g.astype('float64'); ee = e.astype('float64')
            neq = ~(np.isclose(gg, ee, atol=args.atol, rtol=0.0, equal_nan=True)
                    | (gg.isna() & ee.isna()))
        else:
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

# a '[verify] <q> failed' line is a hard failure even though the per-query
# parquet was simply absent (already counted) — surface the reasons
for line in verify_errors:
    print(f"VERIFY-ERROR {line}")

print(f"\n{ok} ok, {fail} fail" + (f", {len(verify_errors)} verify errors" if verify_errors else ""))
sys.exit(1 if (fail or verify_errors) else 0)
