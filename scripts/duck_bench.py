#!/usr/bin/env python3
"""Times the DuckDB oracle for the bench query set (dev tool, not library
code) — the same-host, same-data baseline BASELINE.md's decomposition uses.

Usage: python3 scripts/duck_bench.py [sf_dir] [oracle_json] [bench_json]

oracle_json comes from a graft.Verify run (oracle_sql.json); bench_json is
a graft.Bench output line (its "queries" keys select the bench set). Prints
one JSON line: median-of-ROUNDS per query (32 threads) plus the total.
"""
import glob
import json
import os
import statistics
import sys
import time

import duckdb

sf_dir = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.1'
oracle_path = sys.argv[2] if len(sys.argv) > 2 else '/tmp/verify_out/oracle_sql.json'
bench_path = sys.argv[3] if len(sys.argv) > 3 else '/tmp/bench_sf01.json'
rounds = int(os.environ.get('ROUNDS', '3'))

con = duckdb.connect()
con.execute("SET threads TO 32")
for f in glob.glob(f'{sf_dir}/*.parquet'):
    name = os.path.basename(f).replace('.parquet', '')
    # Spark-written tables are DIRECTORIES of part files; glob them
    path = f'{f}/*.parquet' if os.path.isdir(f) else f
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{path}'")

oracle = json.load(open(oracle_path))
names = list(json.load(open(bench_path))['queries'].keys())

res = {}
skipped = []
for n in names:
    if n not in oracle:
        skipped.append(n)
        continue
    ts = []
    for _ in range(rounds):
        t0 = time.time()
        con.execute(oracle[n]).fetchall()
        ts.append(time.time() - t0)
    res[n] = statistics.median(ts)

print(json.dumps({
    "total": round(sum(res.values()), 4),
    "queries": {k: round(v, 4) for k, v in res.items()},
    "skipped_no_oracle": skipped,
    "rounds": rounds,
    "sf": sf_dir,
}))
