#!/usr/bin/env python3
"""Compare two Bench JSON lines (e.g. sf0.1 vs sf1, a 10x data step) and
report per-query scaling. ratio = t_big / t_small; with DATA_FACTOR=10 a
ratio <= ~10 is at-worst-linear. Small absolute times are noise-dominated,
so queries under FLOOR seconds at the larger sf are reported but not
flagged. Usage: scale_report.py small.json big.json [data_factor]"""
import json, sys

small = json.loads(open(sys.argv[1]).read().strip().splitlines()[-1])
big = json.loads(open(sys.argv[2]).read().strip().splitlines()[-1])
factor = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
FLOOR = 1.0  # sec at the larger sf below which ratios are noise

qs, qb = small["queries"], big["queries"]
rows = []
for name in sorted(qb):
    if name not in qs:
        rows.append((name, None, qb[name], None)); continue
    r = qb[name] / max(qs[name], 1e-3)
    rows.append((name, qs[name], qb[name], r))

flagged = [(n, a, b, r) for n, a, b, r in rows
           if r is not None and b >= FLOOR and r > factor * 1.5]
print(f"queries: small={len(qs)} big={len(qb)} "
      f"total: {small['value']:.1f}s -> {big['value']:.1f}s "
      f"(x{big['value']/small['value']:.2f} on x{factor:g} data)")
worst = sorted((x for x in rows if x[3] is not None), key=lambda x: -x[3])[:15]
print("\nworst scaling ratios (name, t_small, t_big, ratio):")
for n, a, b, r in worst:
    mark = " <-- SUPERLINEAR" if (n, a, b, r) in flagged else ""
    print(f"  {n:34s} {a:7.2f} {b:8.2f}  x{r:5.1f}{mark}")
print(f"\nsuperlinear-and-slow (> {factor}x1.5 ratio, >= {FLOOR}s): {len(flagged)}")
slow = sorted(rows, key=lambda x: -x[2])[:10]
print("\nslowest at big sf:")
for n, a, b, r in slow:
    print(f"  {n:34s} {b:8.2f}s" + (f"  (x{r:.1f})" if r else ""))
