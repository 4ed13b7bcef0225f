#!/usr/bin/env python3
"""Compare two Bench JSON lines per query: flags moves beyond a ratio.
Usage: python3 tools/benchdiff.py <old.json> <new.json> [ratio=1.3] [floor_s=0.3]
Queries under floor_s in BOTH runs are skipped (sub-overhead noise)."""
import sys, json

old = json.loads(open(sys.argv[1]).readline())["queries"]
new = json.loads(open(sys.argv[2]).readline())["queries"]
ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 1.3
floor = float(sys.argv[4]) if len(sys.argv) > 4 else 0.3
common = sorted(set(old) & set(new))
bad = []
for q in common:
    o, n = old[q], new[q]
    if max(o, n) < floor:
        continue
    r = n / o if o > 0 else float("inf")
    if r > ratio or r < 1 / ratio:
        bad.append((r, q, o, n))
print(f"common={len(common)} old_total={sum(old[q] for q in common):.1f}s "
      f"new_total={sum(new[q] for q in common):.1f}s")
for r, q, o, n in sorted(bad, reverse=True):
    print(f"  {q}: {o:.3f}s -> {n:.3f}s ({r:.2f}x)")
if not bad:
    print(f"no query moved beyond {ratio}x (floor {floor}s)")
