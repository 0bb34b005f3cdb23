#!/usr/bin/env python3
"""Compute the both-finished anchor ratio from a graft.Bench JSON line
and a bench_oracle.py JSON line at the same scale factor.

Usage: python3 tools/anchor_ratio.py <spark.json> <duck.json>
"""
import json, sys

spark = json.load(open(sys.argv[1]))["queries"]
duck = json.load(open(sys.argv[2]))["queries"]

common = sorted(set(spark) & set(duck))
spark_dnf = sorted(q for q in common if spark[q] < 0)
duck_dnf = sorted(q for q in common if duck[q] < 0)
both = [q for q in common if duck[q] >= 0 and spark[q] >= 0]
s = sum(spark[q] for q in both)
d = sum(duck[q] for q in both)
worst = sorted(both, key=lambda q: spark[q] / max(duck[q], 1e-9),
               reverse=True)[:10]
print(json.dumps({
    "n_common": len(common), "n_both_finished": len(both),
    "spark_sec": round(s, 1), "duck_sec": round(d, 1),
    "ratio": round(s / max(d, 1e-9), 3) if both else None,
    "spark_dnf": spark_dnf,
    "duck_dnf": duck_dnf,
    "spark_only_missing": sorted(set(duck) - set(spark)),
    "duck_only_missing": sorted(set(spark) - set(duck)),
    "worst_ratio_queries": {q: [round(spark[q], 2), round(duck[q], 2)]
                            for q in worst},
}, indent=1))
