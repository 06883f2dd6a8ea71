#!/usr/bin/env python3
"""Time each DuckDB oracle from outDir/oracle_sql.json against sfDir tables.

Usage: python3 tools/time_oracles.py [sfDir] [outDir] [topN]
Prints per-oracle wall seconds, slowest first — the profiling half of the
gate-cost work (tools/check.py is the correctness half).
"""
import json, sys, glob, time
import duckdb

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
top = int(sys.argv[3]) if len(sys.argv) > 3 else 40

con = duckdb.connect()
for p in glob.glob(f"{sf}/*.parquet"):
    name = p.split("/")[-1].replace(".parquet", "")
    con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{out}/oracle_sql.json"))
times = []
t00 = time.time()
for name in sorted(oracle):
    t0 = time.time()
    try:
        con.sql(oracle[name]).df()
        err = ""
    except Exception as e:
        err = f" ERR {e}"
    times.append((time.time() - t0, name, err))
times.sort(reverse=True)
print(f"total {time.time()-t00:.1f}s over {len(times)} oracles")
for dt, name, err in times[:top]:
    print(f"{dt:8.2f}s  {name}{err}")
print(f"tail sum (rest): {sum(t[0] for t in times[top:]):.1f}s")
