#!/usr/bin/env python3
"""Per-query bench regression diff between two bench_queries.json files
(the durable artifact graft.Bench writes since r12).

Usage: diff_bench.py OLD.json NEW.json [threshold_ratio=1.3] [floor_sec=0.3]

Prints queries whose median moved by more than threshold_ratio in either
direction (restricted to queries above floor_sec in at least one run, so
micro-query jitter doesn't register), plus added/removed queries and the
total. Exit code 0 always — this is a report, not a gate.
"""
import json, sys

old_p, new_p = sys.argv[1], sys.argv[2]
thresh = float(sys.argv[3]) if len(sys.argv) > 3 else 1.3
floor = float(sys.argv[4]) if len(sys.argv) > 4 else 0.3

old = json.load(open(old_p))["queries"]
new = json.load(open(new_p))["queries"]

both = sorted(set(old) & set(new))
regr, impr = [], []
for q in both:
    a, b = old[q], new[q]
    if max(a, b) < floor:
        continue
    r = b / a if a > 0 else float("inf")
    if r >= thresh:
        regr.append((r, q, a, b))
    elif r <= 1.0 / thresh:
        impr.append((r, q, a, b))

for r, q, a, b in sorted(regr, reverse=True):
    print(f"REGR {q}: {a:.2f}s -> {b:.2f}s ({r:.2f}x)")
for r, q, a, b in sorted(impr):
    print(f"IMPR {q}: {a:.2f}s -> {b:.2f}s ({r:.2f}x)")
for q in sorted(set(new) - set(old)):
    print(f"NEW  {q}: {new[q]:.2f}s")
for q in sorted(set(old) - set(new)):
    print(f"GONE {q}: was {old[q]:.2f}s")
to, tn = sum(old.values()), sum(new.values())
print(f"\ntotal: {to:.1f}s -> {tn:.1f}s | {len(both)} shared, "
      f"{len(regr)} regressed, {len(impr)} improved "
      f"(ratio >= {thresh}, floor {floor}s)")
