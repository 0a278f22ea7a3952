#!/usr/bin/env python3
"""Build the BENCH_SF10.md ratio table from two detailed Bench JSON lines
(same query subset, same pass count, sf1 vs sf10). Usage:
  python3 tools/sf10_ratios.py sf1.json sf10.json > BENCH_SF10.md.part
"""
import json
import sys

a = json.load(open(sys.argv[1]))   # sf1
b = json.load(open(sys.argv[2]))   # sf10

qa, qb = a["queries"], b["queries"]
assert set(qa) == set(qb), set(qa) ^ set(qb)

# Guard: a sub-10ms sf1 query rounded to 0.0 must not kill the table build.
rows = [(k, qa[k], qb[k], qb[k] / max(qa[k], 1e-9)) for k in qa]
rows.sort(key=lambda r: -r[3])

print("| query | sf1 s | sf10 s | ratio (10x data) |")
print("|---|---|---|---|")
for k, s1, s10, r in rows:
    print(f"| {k} | {s1:.2f} | {s10:.2f} | {r:.2f}x |")
ta, tb = a["value"], b["value"]
print(f"| **TOTAL** | **{ta:.1f}** | **{tb:.1f}** | **{tb/ta:.2f}x** |")
print()
print(f"sf1 leg: load1 {a['load1_at_start']}, passes {a['passes']}, "
      f"errors {a['errors']}")
print(f"sf10 leg: load1 {b['load1_at_start']}, passes {b['passes']}, "
      f"errors {b['errors']}")
