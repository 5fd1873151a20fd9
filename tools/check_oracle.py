#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare (t2 gate).

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <outDir>/<name> parquet result produced by graft.Verify, runs the
matching SQL from oracle_sql.json in DuckDB over the raw testdata parquet, and
compares: columns sorted by name, rows compared in order, exact value equality
(floats compared bitwise after float64 coercion; NaN==NaN).
"""
import json, sys, math
import duckdb
import pandas as pd

sfdir, outdir = sys.argv[1], sys.argv[2]
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].reset_index(drop=True)
    return df

fails, passes = [], 0
for name, sql in sorted(oracle.items()):
    try:
        got = pd.read_parquet(f"{outdir}/{name}")
        exp = con.sql(sql).df()
    except Exception as e:
        fails.append((name, f"load/exec error: {e}"))
        continue
    got, exp = norm(got), norm(exp)
    if list(got.columns) != list(exp.columns):
        fails.append((name, f"columns differ: spark={list(got.columns)} duck={list(exp.columns)}"))
        continue
    for c_ in got.columns:
        if str(got[c_].dtype) != str(exp[c_].dtype):
            print(f"WARN {name}.{c_}: dtype spark={got[c_].dtype} duck={exp[c_].dtype}")
    if len(got) != len(exp):
        fails.append((name, f"row count differs: spark={len(got)} duck={len(exp)}"))
        continue
    bad = None
    for c in got.columns:
        a, b = got[c], exp[c]
        try:
            if a.dtype.kind == 'f' or b.dtype.kind == 'f':
                a2, b2 = a.astype('float64'), b.astype('float64')
                neq = ~((a2 == b2) | (a2.isna() & b2.isna()))
            else:
                a2, b2 = a.astype(str), b.astype(str)
                neq = ~((a2 == b2) | (a.isna() & b.isna()))
        except Exception as e:
            bad = (c, f"compare error: {e}")
            break
        if neq.any():
            i = int(neq.idxmax())
            bad = (c, f"row {i}: spark={a.iloc[i]!r} duck={b.iloc[i]!r} ({int(neq.sum())} diffs)")
            break
    if bad:
        fails.append((name, f"col {bad[0]}: {bad[1]}"))
    else:
        passes += 1

print(f"PASS {passes}/{len(oracle)}")
for n, msg in fails:
    print(f"FAIL {n}: {msg}")
sys.exit(1 if fails else 0)
