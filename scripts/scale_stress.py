#!/usr/bin/env python3
"""Dev tool (not part of the Scala build): build an N-times-scaled copy
of an sf directory by unioning key-shifted replicas, for local
scale-stress timing of the headline operators (documented in
docs/SCALE.md "Scale-stress evidence").

Replica i shifts every entity key by i*SHIFT so foreign keys stay
consistent inside a replica and never collide across replicas; the
nation/region dims stay as-is (they are broadcast dims at any scale).
Text/embeddings repeat verbatim, which deliberately stresses the dedup
paths with 5-way exact duplicates and 5x shingle DF.

Usage: python3 scripts/scale_stress.py <srcSfDir> <outDir> <replicas>
"""
import sys, os
import duckdb

src, out, n = sys.argv[1], sys.argv[2], int(sys.argv[3])
os.makedirs(out, exist_ok=True)
SHIFT = 100_000_000

SHIFTS = {
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "events": ["event_id", "user_id"],
    "nation": [],
    "region": [],
}

con = duckdb.connect()
for table, keys in SHIFTS.items():
    path = f"{src}/{table}.parquet"
    if not os.path.exists(path):
        print(f"skip {table} (absent)")
        continue
    cols = [r[0] for r in con.execute(
        f"DESCRIBE SELECT * FROM '{path}'").fetchall()]
    for k in keys:  # shifted ranges must not collide across replicas
        mx = con.execute(f"SELECT max({k}) FROM '{path}'").fetchone()[0]
        assert mx is None or mx < SHIFT, \
            f"{table}.{k} max {mx} >= SHIFT {SHIFT}: replicas would overlap"
    reps = n if keys else 1  # keyless dims are not replicated
    selects = []
    for i in range(reps):
        exprs = ", ".join(
            f"{c} + {i * SHIFT} AS {c}" if c in keys else c for c in cols)
        selects.append(f"SELECT {exprs} FROM '{path}'")
    q = " UNION ALL ".join(selects)
    con.execute(f"COPY ({q}) TO '{out}/{table}.parquet' (FORMAT PARQUET)")
    cnt = con.execute(f"SELECT count(*) FROM '{out}/{table}.parquet'").fetchone()[0]
    print(f"{table}: {cnt} rows")
print("done")
