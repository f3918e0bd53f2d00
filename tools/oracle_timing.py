#!/usr/bin/env python3
"""Regenerate ORACLE_TIMING.json: wall-time every SparkEntry.oracleSql
statement in DuckDB against the sf0.01 parquet tables (median of 3).
Run on a QUIET box — these numbers are the external-engine comparison
baseline the bench ratio is judged against.

Usage: python3 tools/oracle_timing.py [sf_dir] [oracle_sql.json] [out]
Default oracle source: /tmp/vout/oracle_sql.json (a fresh graft.Verify
dump); default output: ORACLE_TIMING.json in the repo root.
"""
import sys, os, json, glob, time
import duckdb

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
oracle_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/vout/oracle_sql.json"
out_path = sys.argv[3] if len(sys.argv) > 3 else \
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "ORACLE_TIMING.json")

con = duckdb.connect()
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(p).replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(oracle_path))
timings = {}
for name in sorted(oracle):
    runs = []
    for _ in range(3):
        t0 = time.time()
        try:
            con.execute(oracle[name]).fetchall()
        except Exception as e:
            print(f"FAIL {name}: {str(e)[:120]}")
            runs = None
            break
        runs.append(time.time() - t0)
    if runs:
        timings[name] = round(sorted(runs)[1], 3)
        print(f"{timings[name]:8.3f}  {name}")

json.dump({"sf": sf_dir, "engine": "duckdb", "queries": timings},
          open(out_path, "w"), indent=1)
print(f"\n{len(timings)} oracles timed -> {out_path}; "
      f"sum {sum(timings.values()):.1f} s")
