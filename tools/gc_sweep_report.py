#!/usr/bin/env python3
"""Summarize a Bench GC-floor sweep (r13 verdict #1).

Usage: gc_sweep_report.py /tmp/bq_floor_0.json /tmp/bq_floor_0.25.json ...

Each input is a Bench per-query map (the SPARK_GRAFT_QUERIES_OUT file)
produced at one SPARK_GRAFT_GC_FLOOR_SEC setting. Prints, per floor:
summed medians, summed mins, and the count of queries whose median is
>1.25x the minimum across all swept floors (the "smeared" tail) — the
two target numbers from the r12 verdict (wall <= ~1130 s is read off
the sweep log, not the map).
"""
import json
import sys


def load(path):
    with open(path) as f:
        return json.load(f)


def main(paths):
    maps = {p: load(p) for p in paths}
    shared = set.intersection(*(set(m["queries"]) for m in maps.values()))
    best = {q: min(m["queries"][q] for m in maps.values()) for q in shared}
    print(f"{'file':40s} {'sum_med':>9s} {'sum_min':>9s} "
          f"{'n>1.25x best':>13s} {'worst_ratio':>12s}")
    for p, m in maps.items():
        smed = sum(m["queries"][q] for q in shared)
        smin = sum(m["queries_min"][q] for q in shared)
        ratios = {q: m["queries"][q] / best[q] for q in shared if best[q] > 0.05}
        n_smear = sum(1 for r in ratios.values() if r > 1.25)
        worst = max(ratios.items(), key=lambda kv: kv[1])
        print(f"{p:40s} {smed:9.1f} {smin:9.1f} {n_smear:13d} "
              f"{worst[1]:7.2f} ({worst[0]})")


if __name__ == "__main__":
    main(sys.argv[1:])
