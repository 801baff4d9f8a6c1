"""Time every DuckDB oracle in outdir/oracle_sql.json against sfdir.

Usage: python3 tools/time_oracles.py <outdir> <sfdir> [name-regex]

Each oracle runs in a fresh subprocess with a hard timeout (default 120 s)
so one pathological query cannot stall the sweep. Prints per-oracle wall
seconds sorted slowest-first; exits non-zero if any oracle exceeds 30 s
(the budget that keeps the driver's full compare well inside its window).
"""
import json
import re
import subprocess
import sys
import time

outdir, sfdir = sys.argv[1], sys.argv[2]
pat = re.compile(sys.argv[3]) if len(sys.argv) > 3 else None
TIMEOUT = 120
BUDGET = 30.0

oracle = json.load(open(f"{outdir}/oracle_sql.json"))

RUNNER = r"""
import duckdb, sys
con = duckdb.connect()
for t in ['region','nation','customer','supplier','part','orders','lineitem',
          'events','documents','embeddings']:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('%s/{t}.parquet')")
sql = sys.stdin.read()
n = len(con.execute(sql).fetchall())
print(n)
""" % sfdir

results = []
for name, sql in sorted(oracle.items()):
    if pat and not pat.search(name):
        continue
    t0 = time.time()
    try:
        p = subprocess.run([sys.executable, "-c", RUNNER], input=sql,
                           capture_output=True, text=True, timeout=TIMEOUT)
        dt = time.time() - t0
        if p.returncode != 0:
            results.append((dt, name, f"ERROR {p.stderr.strip().splitlines()[-1][:120]}"))
        else:
            results.append((dt, name, f"{p.stdout.strip()} rows"))
    except subprocess.TimeoutExpired:
        results.append((float(TIMEOUT), name, "TIMEOUT"))

bad = 0
for dt, name, info in sorted(results, reverse=True):
    flag = " <-- OVER BUDGET" if dt > BUDGET else ""
    if flag or "ERROR" in info or "TIMEOUT" in info:
        bad += 1
    print(f"{dt:8.2f}s  {name:28s} {info}{flag}")
print(f"\ntotal {sum(r[0] for r in results):.1f}s over {len(results)} oracles; "
      f"{bad} over-budget/failed")
sys.exit(1 if bad else 0)
