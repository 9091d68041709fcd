#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (dev tool only — not
part of the Scala build): run graft.Verify first, then compare each
query's parquet output against its DuckDB oracle SQL on the same tables.

Usage: python3 scripts/check_oracle.py <sfDir> <verifyOutDir>
"""
import json, sys, glob, os
import duckdb

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(p)[:-len(".parquet")]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fails, passes = [], []
for name, sql in sorted(oracle.items()):
    spark_dir = f"{out_dir}/{name}"
    if not os.path.isdir(spark_dir):
        fails.append((name, "no spark output")); continue
    try:
        got = con.execute(
            f"SELECT * FROM parquet_scan('{spark_dir}/*.parquet')").df()
        exp = con.execute(sql).df()
    except Exception as e:
        fails.append((name, f"exec error: {e}")); continue
    got = got.reindex(sorted(got.columns), axis=1)
    exp = exp.reindex(sorted(exp.columns), axis=1)
    if list(got.columns) != list(exp.columns):
        fails.append((name, f"cols {list(got.columns)} vs {list(exp.columns)}"))
        continue
    if len(got) != len(exp):
        fails.append((name, f"rows {len(got)} vs {len(exp)}")); continue
    if len(got) == 0:
        passes.append(name); continue
    gs = sorted(got.astype(str).apply(lambda r: "|".join(r), axis=1).tolist())
    es = sorted(exp.astype(str).apply(lambda r: "|".join(r), axis=1).tolist())
    if gs != es:
        diff = [(a, b) for a, b in zip(gs, es) if a != b][:3]
        fails.append((name, f"value diff, e.g. {diff}")); continue
    passes.append(name)

print(f"PASS {len(passes)}: {' '.join(passes)}")
for name, why in fails:
    print(f"FAIL {name}: {why}")
sys.exit(1 if fails else 0)
