#!/usr/bin/env python3
"""Trio-vs-trio regression adjudication (round-10 verdict #5).

Compares per-query best-of-3 between two committed bench trios with
canary normalization: each run's times are divided by its
canary_ratio-vs-historical (from the artifact when present, else computed
from canary_series against Bench.CanaryRefSec = 0.27), so a uniformly
slower host does not read as a code regression. Prints queries whose
normalized best-of-3 exceeds --threshold (default 1.3x) with both raw and
normalized ratios — the in-artifact adjudication evidence the verdict
asked for.

Usage: python3 tools/trio_compare.py <roundA> <roundB> [--threshold=1.3]
       (rounds are the N in BENCH_local_rN_run{1,2,3}.json; B = newer)
"""
import json, statistics, sys

REF = 0.27


def load(round_n):
    runs = []
    for i in (1, 2, 3):
        d = json.load(open(f"BENCH_local_r{round_n}_run{i}.json"))
        cs = [c for c in d.get("canary_series", []) if c > 0]
        # canary_ratio <= 0 is Bench's no-canary sentinel, not a ratio
        r = d.get("canary_ratio")
        ratio = r if r and r > 0 else (statistics.median(cs) / REF if cs else 1.0)
        runs.append((d["queries"], ratio))
    return runs


def best(runs, normalize):
    out = {}
    for qs, ratio in runs:
        for q, t in qs.items():
            if t < 0:
                continue
            v = t / ratio if normalize else t
            if q not in out or v < out[q]:
                out[q] = v
    return out


def main():
    a, b = sys.argv[1], sys.argv[2]
    thr = float(next((x.split("=")[1] for x in sys.argv if x.startswith("--threshold=")), "1.3"))
    ra, rb = load(a), load(b)
    for label, norm in (("raw", False), ("canary-normalized", True)):
        ba, bb = best(ra, norm), best(rb, norm)
        common = sorted(set(ba) & set(bb))
        total_a, total_b = sum(ba[q] for q in common), sum(bb[q] for q in common)
        breaches = [(bb[q] / ba[q], q) for q in common if bb[q] / ba[q] > thr]
        print(f"[{label}] common={len(common)} total {total_a:.1f} -> {total_b:.1f} "
              f"({total_b / total_a:.3f}x); breaches>{thr}x: {len(breaches)}")
        for r, q in sorted(breaches, reverse=True):
            print(f"  {q}: {ba[q]:.2f} -> {bb[q]:.2f} s ({r:.2f}x)")
    new = sorted(set(best(rb, False)) - set(best(ra, False)))
    if new:
        print("new queries:", new)


if __name__ == "__main__":
    main()
