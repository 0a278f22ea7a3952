#!/usr/bin/env python3
"""Build the BENCH_SF10.md ratio table from two detailed Bench JSON lines
(same query subset, same pass count, sf1 vs sf10). Usage:
  python3 tools/sf10_ratios.py sf1.json sf10.json > BENCH_SF10.md.part

Emits BOTH raw and ruler-normalized ratios when both legs carry a host
ruler (ruler_wide_sec, or the r15-era ruler_<N>t_sec): the r15
adjudication measured 1.47x same-day ruler drift and 1-11% CPU steal on
this VM, so a raw ratio alone can't separate plan cost from host speed.
normalized = (sf10/ruler_b) / (sf1/ruler_a).
"""
import json
import re
import sys

a = json.load(open(sys.argv[1]))   # sf1
b = json.load(open(sys.argv[2]))   # sf10


def ruler(leg):
    if "ruler_wide_sec" in leg:
        return float(leg["ruler_wide_sec"])
    for k, v in leg.items():
        # wide only: ruler_1t_sec is the single-thread ruler, not a match
        if re.fullmatch(r"ruler_[0-9]+t_sec", k) and k != "ruler_1t_sec":
            return float(v)
    return None


ra, rb = ruler(a), ruler(b)
# host factor: >1 means the sf10 leg ran on a slower host than the sf1 leg
hf = (rb / ra) if (ra and rb and ra > 0) else None

qa, qb = a["queries"], b["queries"]
assert set(qa) == set(qb), set(qa) ^ set(qb)

# Guard: a sub-10ms sf1 query rounded to 0.0 must not kill the table build.
rows = [(k, qa[k], qb[k], qb[k] / max(qa[k], 1e-9)) for k in qa]
rows.sort(key=lambda r: -r[3])


def norm(r):
    return f"{r / hf:.2f}x" if hf else "n/a"


print("| query | sf1 s | sf10 s | raw ratio (10x data) | ruler-normalized |")
print("|---|---|---|---|---|")
for k, s1, s10, r in rows:
    print(f"| {k} | {s1:.2f} | {s10:.2f} | {r:.2f}x | {norm(r)} |")
ta, tb = a["value"], b["value"]
print(f"| **TOTAL** | **{ta:.1f}** | **{tb:.1f}** | **{tb/ta:.2f}x** "
      f"| **{norm(tb/ta)}** |")
print()
print(f"sf1 leg: load1 {a['load1_at_start']}, passes {a['passes']}, "
      f"errors {a['errors']}, ruler_wide {ra}")
print(f"sf10 leg: load1 {b['load1_at_start']}, passes {b['passes']}, "
      f"errors {b['errors']}, ruler_wide {rb}")
if hf:
    print(f"host factor (sf10 leg vs sf1 leg, wide ruler): {hf:.2f}x — "
          f"normalized = raw / {hf:.2f}")
else:
    print("host factor: unavailable (a leg lacks the ruler) — raw only")
