"""Compare a bench_out.json against BASELINE.md rows: per-query ratio,
sorted worst-first. Usage: python tools/cmp_baseline.py [bench_out.json]"""

import json
import re
import sys

bench_path = sys.argv[1] if len(sys.argv) > 1 else "bench_out.json"
bench = json.load(open(bench_path))["queries"]

base = {}
for line in open("BASELINE.md"):
    m = re.match(r"\| (q\w+) \| [\d.]+ \| ([\d.]+) \|", line)
    if m:
        base[m.group(1)] = float(m.group(2))

rows = []
for q, sec in bench.items():
    if q in base:
        rows.append((sec / base[q], q, sec, base[q]))
    else:
        rows.append((float("nan"), q, sec, None))

rows.sort(key=lambda r: -(r[0] if r[0] == r[0] else -1))
over2 = [r for r in rows if r[0] == r[0] and r[0] > 2.0]
ratios = sorted(r[0] for r in rows if r[0] == r[0])
med = ratios[len(ratios) // 2]
print(f"n={len(rows)} with_baseline={len(ratios)} median={med:.2f}x over2x={len(over2)}")
for ratio, q, sec, b in rows[:25]:
    print(f"{ratio:6.2f}x  {q:38s} {sec:8.2f}s  base={b}")
