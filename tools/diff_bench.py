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

old_full = json.load(open(old_p))
new_full = json.load(open(new_p))
old = old_full["queries"]
new = new_full["queries"]

# r16 episode-robustness fields (absent in pre-r16 artifacts): isolation
# re-runs paired with a control query, plus the ambient canary stamp —
# every REGR line below is machine-attributed plan-vs-ambient from them.
iso = new_full.get("queries_isolated", {})
iso_ctl = new_full.get("queries_isolated_control", {})
ctl_name = new_full.get("iso_control")
ctl_committed = old.get(ctl_name) if ctl_name else None
episode = new_full.get("episode_suspect")
canary_drift = new_full.get("canary_drift")
canary_vs = new_full.get("canary_vs_committed")

if episode is not None:
    stamp = "EPISODE SUSPECT" if episode else "canary clean"
    vs = f"{canary_vs:.2f}x" if isinstance(canary_vs, (int, float)) else "n/a"
    print(f"[{stamp}] in-run canary drift {canary_drift:.2f}x, "
          f"vs committed {vs}\n")


def attribute(q, a, b):
    """One-line triage verdict for a REGR line, from in-artifact data."""
    if q not in iso:
        return " [episode-suspect run; no isolation entry]" if episode else ""
    iv = iso[q]
    ctl_bits = ""
    ctl_clean = None
    if q in iso_ctl and ctl_committed:
        cr = iso_ctl[q] / ctl_committed
        ctl_clean = cr < 1.25
        ctl_bits = (f", control {ctl_name} {iso_ctl[q]:.2f}s = "
                    f"{cr:.2f}x committed")
    if iv < thresh * a:
        return (f" [AMBIENT/suite-state: isolated {iv:.2f}s ~ old map"
                f"{ctl_bits}]")
    if ctl_clean is False:
        return (f" [AMBIENT: isolation itself contaminated -- isolated "
                f"{iv:.2f}s{ctl_bits}]")
    return (f" [PLAN?: isolated {iv:.2f}s reproduces the regression"
            f"{ctl_bits or ', no control recorded'}]")

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
    print(f"REGR {q}: {a:.2f}s -> {b:.2f}s ({r:.2f}x){attribute(q, a, b)}")
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
