#!/usr/bin/env python3
"""Local pre-flight for the driver's t2 correctness gate.

Runs after `sbt "runMain graft.Verify <sfDir> <outDir>"`:
for each query, loads the Spark parquet result and the DuckDB oracle
result (oracle_sql.json), sorts columns by name and rows by all
columns, and compares values EXACTLY (bitwise for floats) — at least
as strict as the driver's hash compare.

Usage: python3 tools/check.py <sfDir> <outDir>
"""
import json, math, sys
import duckdb

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fails, passes, skipped = [], [], []
for name, sql in sorted(oracle.items()):
    try:
        got = con.execute(
            f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetchdf()
    except Exception as e:
        fails.append((name, f"spark result unreadable: {e}")); continue
    try:
        exp = con.execute(sql).fetchdf()
    except Exception as e:
        fails.append((name, f"oracle SQL failed: {e}")); continue
    if sorted(got.columns) != sorted(exp.columns):
        fails.append((name, f"columns differ: spark={sorted(got.columns)} oracle={sorted(exp.columns)}")); continue
    cols = sorted(got.columns)
    g = got[cols].sort_values(cols, kind="mergesort").reset_index(drop=True)
    e = exp[cols].sort_values(cols, kind="mergesort").reset_index(drop=True)
    if len(g) != len(e):
        fails.append((name, f"row count: spark={len(g)} oracle={len(e)}")); continue
    bad = None
    for c in cols:
        gv, ev = g[c].tolist(), e[c].tolist()
        for i, (x, y) in enumerate(zip(gv, ev)):
            same = (x == y) or (x is None and y is None)
            if not same and isinstance(x, float) and isinstance(y, float):
                same = (math.isnan(x) and math.isnan(y)) or x == y
            if not same and str(x) == str(y):
                same = True
            if not same:
                bad = f"col {c} row {i}: spark={x!r} oracle={y!r}"
                break
        if bad: break
    if bad: fails.append((name, bad))
    else: passes.append(name)

# queries without an oracle: rows-only
import os
for name in sorted(os.listdir(out_dir)):
    p = os.path.join(out_dir, name)
    if os.path.isdir(p) and name not in oracle:
        try:
            n = con.execute(f"SELECT count(*) FROM '{p}/*.parquet'").fetchone()[0]
            (passes if n > 0 else fails).append(
                (name + " [rows-only]") if n > 0 else (name, "0 rows"))
        except Exception as ex:
            fails.append((name, f"unreadable: {ex}"))

print(f"PASS {len(passes)}: {' '.join(p if isinstance(p,str) else p[0] for p in passes)}")
if fails:
    print(f"FAIL {len(fails)}:")
    for n, why in fails:
        print(f"  {n}: {why}")
    sys.exit(1)
print("all green")
