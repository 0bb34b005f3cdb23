#!/usr/bin/env python3
"""Render the second-decade growth table from tools/decades.sh output.

Usage: python3 tools/decades_report.py [target/decades]

Reads spark_{sf01,x10,x100}.json (and oracle_{...}.json if present) and
prints a markdown table: per-query seconds at each scale plus the
per-decade growth factors — the numbers BASELINE.md records. Dev-tool
only.
"""
import json
import sys


def load(path):
    try:
        with open(path) as f:
            return json.load(f)["queries"]
    except FileNotFoundError:
        return None


def fmt(v):
    return "DNF" if v is None or v < 0 else f"{v:.2f}"


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "target/decades"
    cols = [("sf0.1", "sf01"), ("10x", "x10"), ("100x", "x100")]
    for engine in ("spark", "oracle"):
        runs = {label: load(f"{out}/{engine}_{tag}.json")
                for label, tag in cols}
        if all(v is None for v in runs.values()):
            continue
        names = sorted(set().union(*[r.keys() for r in runs.values() if r]))
        print(f"\n### {engine}\n")
        print("| query | " + " | ".join(l for l, _ in cols) +
              " | d1 growth | d2 growth |")
        print("|---|" + "---|" * (len(cols) + 2))
        for n in names:
            v = [runs[l].get(n) if runs[l] else None for l, _ in cols]
            def g(a, b):
                return (f"{b/a:.1f}x" if a and b and a > 0 and b > 0
                        else "-")
            print(f"| {n} | " + " | ".join(fmt(x) for x in v) +
                  f" | {g(v[0], v[1])} | {g(v[1], v[2])} |")
        tot = [sum(x for x in (runs[l] or {}).values() if x and x > 0)
               for l, _ in cols]
        print("| **total (finished)** | " +
              " | ".join(f"{t:.1f}" for t in tot) + " | | |")


if __name__ == "__main__":
    main()
