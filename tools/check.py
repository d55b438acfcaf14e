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
import numpy as np
import pandas as pd


def values_equal(x, y):
    """Driver-parity value compare: dtype-gated upstream, so here we only
    need exact scalar equality. Floats compare by repr (shortest
    round-trip — catches -0.0 vs 0.0 and any last-ulp drift the driver's
    representation-sensitive hash would catch); nulls of any flavor
    (None/NaN/NaT) match each other only."""
    if isinstance(x, np.ndarray) or isinstance(y, np.ndarray):
        return (isinstance(x, np.ndarray) and isinstance(y, np.ndarray)
                and x.shape == y.shape and bool((x == y).all()))
    try:
        xna, yna = bool(pd.isna(x)), bool(pd.isna(y))
    except (TypeError, ValueError):
        xna, yna = False, False
    if xna or yna:
        return xna and yna
    if isinstance(x, float) and isinstance(y, float):
        return repr(x) == repr(y)
    return x == y

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
        # dtype must match first: the driver's hash is representation-
        # sensitive, so an int64 Spark column vs a float64 oracle column
        # (DuckDB HUGEINT promotion — bit q76 in round 3) is a hash-fail
        # even when every value compares == in python. Integer WIDTHS
        # collapse to one class (int32 5 and int64 5 render identically,
        # so the driver's hash can't tell them apart) — int-vs-float
        # stays a failure ("5" != "5.0").
        def dclass(d):
            s = str(d)
            return "int" if s.startswith(("int", "uint")) else s
        if dclass(g[c].dtype) != dclass(e[c].dtype):
            bad = f"col {c} dtype: spark={g[c].dtype} oracle={e[c].dtype}"
            break
        gv, ev = g[c].tolist(), e[c].tolist()
        for i, (x, y) in enumerate(zip(gv, ev)):
            if not values_equal(x, y):
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
