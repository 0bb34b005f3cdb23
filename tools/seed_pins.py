#!/usr/bin/env python3
"""Seed measurements/pins.json from every historical CERTIFIED row.

The pin ledger (VERDICT r15 task 2) is normally maintained by Bench
itself: after each run, any row that certified below its standing pin
becomes the new pin. This script bootstraps the ledger from the
already-committed artifacts so the first r16 run has pins to key its
retry ordering and vs_pin ratios off:

  - measurements/*.json full maps (queries + calib.cert + sf),
  - measurements/r*_ledger.json folds ({tag: {queries, cert, sf}}),
  - bench_full.json at the repo root (the last driver run).

A row qualifies iff its artifact carries a cert verdict of true AND the
artifact's runs (when recorded) is >= 2 — the same rule Bench applies.
Pins are keyed by the fixture dir's basename ("sf0.1", "x10", "x100").
"""
import glob
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "measurements", "pins.json")

pins = {}  # sfkey -> {query: best certified sec}


def feed(queries, cert, sf, runs):
    if not sf or runs is not None and runs < 2:
        return 0
    key = os.path.basename(sf.rstrip("/"))
    n = 0
    for q, sec in (queries or {}).items():
        if sec is None or sec <= 0 or not (cert or {}).get(q):
            continue
        cur = pins.setdefault(key, {})
        if q not in cur or sec < cur[q]:
            cur[q] = sec
            n += 1
    return n


def feed_fullmap(d, path):
    calib = d.get("calib", {})
    return feed(d.get("queries"), calib.get("cert"), d.get("sf"),
                d.get("runs"))


candidates = sorted(glob.glob(os.path.join(REPO, "measurements", "*.json")))
candidates.append(os.path.join(REPO, "bench_full.json"))
for path in candidates:
    if os.path.basename(path) == "pins.json" or not os.path.exists(path):
        continue
    try:
        d = json.load(open(path))
    except Exception as e:
        print(f"skip {path}: {e}", file=sys.stderr)
        continue
    if isinstance(d, dict) and "queries" in d:
        n = feed_fullmap(d, path)
    elif isinstance(d, dict):  # a per-round ledger fold
        n = 0
        for tag, entry in d.items():
            if isinstance(entry, dict) and "queries" in entry:
                n += feed(entry.get("queries"), entry.get("cert"),
                          entry.get("sf"), entry.get("runs"))
    else:
        continue
    if n:
        print(f"{path}: {n} pins improved")

body = {k: dict(sorted(v.items())) for k, v in sorted(pins.items())}
with open(OUT, "w") as f:
    json.dump(body, f, indent=2)
    f.write("\n")
print(f"wrote {OUT}: " +
      ", ".join(f"{k}={len(v)}" for k, v in body.items()))
