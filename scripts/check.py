#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (dev tool, not library code).

Usage: python3 scripts/check.py [sf_dir] [out_dir] [--skip-verify] [names...]

Runs graft.Verify via sbt, then for every query in oracle_sql.json executes
the oracle in DuckDB over the same parquet tables and compares the Spark
parquet output exactly: columns sorted by name, rows sorted, values equal,
dtypes reported when they differ.
"""
import json, subprocess, sys, glob, os
import duckdb

sf_dir = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith('--') else '/root/testdata/sf0.01'
out_dir = sys.argv[2] if len(sys.argv) > 2 and not sys.argv[2].startswith('--') else '/tmp/verify_out'
skip_verify = '--skip-verify' in sys.argv
only = [a for a in sys.argv[3:] if not a.startswith('--')]

if not skip_verify:
    r = subprocess.run(
        ['sbt', '-batch', f'runMain graft.Verify {sf_dir} {out_dir}'],
        capture_output=True, text=True, cwd='/root/repo')
    errs = [l for l in (r.stdout + r.stderr).splitlines() if '[verify]' in l or '[error]' in l and 'INFO' not in l]
    for l in errs[:30]:
        print(l)
    if r.returncode != 0:
        print('VERIFY RUN FAILED rc=', r.returncode)
        print(r.stdout[-3000:])
        sys.exit(1)

con = duckdb.connect()
for f in glob.glob(f'{sf_dir}/*.parquet'):
    name = os.path.basename(f).replace('.parquet', '')
    # Spark-written tables are DIRECTORIES of part files; glob them
    path = f'{f}/*.parquet' if os.path.isdir(f) else f
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{path}'")

oracle = json.load(open(f'{out_dir}/oracle_sql.json'))
declared = sorted(oracle.keys())
if only:
    declared = [n for n in declared if n in only]

n_pass = n_fail = 0
for name in declared:
    try:
        mine_files = glob.glob(f'{out_dir}/{name}/*.parquet')
        if not mine_files:
            print(f'FAIL {name}: no spark output written'); n_fail += 1; continue
        mine = con.execute(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
        ref = con.execute(oracle[name]).df()
    except Exception as e:
        print(f'FAIL {name}: {str(e)[:200]}'); n_fail += 1; continue
    mine = mine[sorted(mine.columns)]
    ref = ref[sorted(ref.columns)]
    if list(mine.columns) != list(ref.columns):
        print(f'FAIL {name}: columns {list(mine.columns)} vs {list(ref.columns)}'); n_fail += 1; continue
    if len(mine) != len(ref):
        print(f'FAIL {name}: rows {len(mine)} vs {len(ref)}'); n_fail += 1; continue
    dt_mine, dt_ref = [str(t) for t in mine.dtypes], [str(t) for t in ref.dtypes]
    mine_s = mine.sort_values(by=list(mine.columns), kind='mergesort').reset_index(drop=True)
    ref_s = ref.sort_values(by=list(ref.columns), kind='mergesort').reset_index(drop=True)
    diffs = []
    for c in mine.columns:
        a, b = mine_s[c], ref_s[c]
        neq = ~((a == b) | (a.isna() & b.isna()))
        if neq.any():
            i = neq.idxmax()
            diffs.append(f'{c}[{i}]: {a[i]!r} != {b[i]!r} ({neq.sum()} diffs)')
    if diffs:
        print(f'FAIL {name}: ' + '; '.join(diffs[:4]))
        n_fail += 1
    else:
        note = '' if dt_mine == dt_ref else f'  [dtypes differ: {list(zip(mine.columns, dt_mine, dt_ref))}]'
        print(f'PASS {name} ({len(mine)} rows){note}')
        n_pass += 1

print(f'\n{n_pass} pass / {n_fail} fail / {len(declared)} declared')
sys.exit(1 if n_fail else 0)
