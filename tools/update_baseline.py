#!/usr/bin/env python3
"""Regenerate BASELINE.md's per-query median table and bench_baseline.json
from two completed Bench logs (local[32] and local[4]).

Usage: python3 tools/update_baseline.py <bench32.log> <bench4.log>

Reads the FINAL {"metric":"total"} line of each log (same scoping rule as
Bench.loadBaseline), replaces everything from the table header
'| query | local[32] s (median) | local[4] s (median) |' to the end of
BASELINE.md with the regenerated table (registry order = the order the
queries object prints in), and rewrites bench_baseline.json from the
local[32] medians.
"""
import sys, json, re

def medians(path):
    last = None
    for line in open(path, encoding="utf-8", errors="replace"):
        if '"metric":"total"' in line:
            last = line
    if last is None:
        sys.exit(f"no metric:total line in {path}")
    m = re.search(r'"queries"\s*:\s*(\{[^}]*\})', last)
    obj = json.loads(m.group(1))
    return obj  # insertion-ordered = registry order

b32, b4 = medians(sys.argv[1]), medians(sys.argv[2])
assert set(b32) == set(b4), set(b32) ^ set(b4)

lines = open("BASELINE.md", encoding="utf-8").read().splitlines()
hdr = "| query | local[32] s (median) | local[4] s (median) |"
cut = lines.index(hdr)
out = lines[:cut] + [hdr, "|---|---|---|"]
for name, t32 in b32.items():
    out.append(f"| {name} | {t32:.2f} | {b4[name]:.2f} |")
open("BASELINE.md", "w", encoding="utf-8").write("\n".join(out) + "\n")

with open("bench_baseline.json", "w", encoding="utf-8") as f:
    json.dump({k: round(v, 4) for k, v in b32.items()}, f, indent=0)
print(f"updated: {len(b32)} queries; totals local[32]={sum(b32.values()):.1f}s "
      f"local[4]={sum(b4.values()):.1f}s")
