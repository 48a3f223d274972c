#!/usr/bin/env python3
"""Materialize /tmp/graft_sf1: a 10x row blow-up of /root/testdata/sf0.1
(each table's rows duplicated 10x, single parquet file per table).
The sf1 bench rung (COVERAGE.md "Performance posture") runs the headline
queries here once per round to catch superlinear driver-side overheads
that sf0.1's fixed planning floor hides. Idempotent: skips tables that
already exist.
"""
import os, sys
import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_sf1"
TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

os.makedirs(DST, exist_ok=True)
for t in TABLES:
    out = f"{DST}/{t}.parquet"
    if os.path.exists(out):
        print(f"skip {t} (exists)")
        continue
    duckdb.sql(
        f"COPY (SELECT t.* FROM read_parquet('{SRC}/{t}.parquet') t, "
        f"range(10) r ORDER BY random()) TO '{out}' (FORMAT parquet)")
    n = duckdb.sql(f"SELECT count(*) FROM read_parquet('{out}')").fetchone()[0]
    print(f"{t}: {n} rows")
print("done:", DST)
