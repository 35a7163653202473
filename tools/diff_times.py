#!/usr/bin/env python3
"""Diff two verify_times.json artifacts (round-over-round perf gate).

Usage: python3 tools/diff_times.py VERIFY_TIMES_r15.json target/verify_out/verify_times.json [threshold]

Prints entries whose time grew by more than `threshold` (default 1.5x,
ignoring sub-200ms noise), new/removed entries, and the totals. Exit
code 1 if any regression exceeds the threshold — wire into the round
ledger: every flagged entry must be explained or fixed.
"""
import json
import sys

old_path, new_path = sys.argv[1], sys.argv[2]
threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
FLOOR = 0.2  # ignore sub-200ms noise on both sides

old = json.load(open(old_path))
new = json.load(open(new_path))

flagged = []
for name, t_new in sorted(new.items(), key=lambda kv: -kv[1]):
    t_old = old.get(name)
    if t_old is None:
        print(f"  NEW      {name:34s} {t_new:7.2f}s")
        continue
    if t_new > FLOOR and t_old > FLOOR and t_new > t_old * threshold:
        flagged.append((name, t_old, t_new))
for name in sorted(set(old) - set(new)):
    print(f"  REMOVED  {name}")

print(f"totals: {sum(old.values()):.1f}s ({len(old)} entries) -> "
      f"{sum(new.values()):.1f}s ({len(new)} entries)")
if flagged:
    print(f"REGRESSIONS > {threshold}x (explain or fix):")
    for name, a, b in flagged:
        print(f"  {name:34s} {a:7.2f}s -> {b:7.2f}s  ({b / a:.2f}x)")
    sys.exit(1)
print(f"no entry grew > {threshold}x (floor {FLOOR}s)")
