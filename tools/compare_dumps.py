#!/usr/bin/env python3
"""Diff two graft.Verify dump directories query-by-query — the round-12
retry-determinism gate: a clean sweep vs a fault-injected sweep
(SPARK_GRAFT_FAULT=kill|spec) must be row-for-row identical, or the plan's
output depends on task attempt history (the nondeterministic-on-retry bug
class: round-robin repartition without sort, unstable limits, first()-style
aggregates over unordered input).

Usage: python3 tools/compare_dumps.py <cleanDir> <faultDir> [out.json]

Rows are canonicalized (columns sorted by name, every cell serialized
recursively — numpy arrays fully expanded, never the truncated ndarray
repr — then rows sorted) so queries without a total ORDER BY still compare
as multisets. Exact value identity; floats via shortest-roundtrip repr.
"""
import sys, json, hashlib
from pathlib import Path
import numpy as np
import pandas as pd

a_dir, b_dir = Path(sys.argv[1]), Path(sys.argv[2])
out_json = sys.argv[3] if len(sys.argv) > 3 else None


def cell(v):
    if isinstance(v, np.ndarray):
        return "[" + ",".join(cell(x) for x in v.tolist()) + "]"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(cell(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{cell(x)}" for k, x in sorted(v.items())) + "}"
    if isinstance(v, (bytes, bytearray)):
        return "0x" + bytes(v).hex()
    if isinstance(v, (np.floating, float)):
        return repr(float(v))
    return repr(v)


def canon(path):
    df = pd.read_parquet(path)
    cols = sorted(df.columns)
    rows = sorted(
        "|".join(cell(r[c]) for c in cols)
        for _, r in df[cols].iterrows())
    h = hashlib.md5("\n".join(rows).encode()).hexdigest()
    return len(df), cols, rows, h


def dumped(d):
    return {p.name for p in d.iterdir()
            if p.is_dir() and (p / "_SUCCESS").exists()}

names_a, names_b = dumped(a_dir), dumped(b_dir)
results, n_ok = {}, 0
for name in sorted(names_a | names_b):
    if name not in names_a or name not in names_b:
        results[name] = f"MISSING in {'fault' if name not in names_b else 'clean'} dump"
        continue
    na, ca, ra, ha = canon(a_dir / name)
    nb, cb, rb, hb = canon(b_dir / name)
    if ca != cb:
        results[name] = f"COLUMNS differ: clean={ca} fault={cb}"
    elif na != nb:
        results[name] = f"ROWS differ: clean={na} fault={nb}"
    elif ha != hb:
        bad = next(i for i, (x, y) in enumerate(zip(ra, rb)) if x != y)
        results[name] = (f"HASH differs (first diverging canonical row {bad}: "
                         f"clean={ra[bad][:160]!r} fault={rb[bad][:160]!r})")
    else:
        results[name] = "identical"
        n_ok += 1

n = len(results)
summary = {"compared": n, "identical": n_ok,
           "divergent": {k: v for k, v in results.items() if v != "identical"}}
print(f"IDENTICAL {n_ok}/{n}")
for k, v in summary["divergent"].items():
    print(f"  DIVERGES {k}: {v}")
if out_json:
    Path(out_json).write_text(json.dumps(summary, indent=1))
sys.exit(0 if n_ok == n else 1)
