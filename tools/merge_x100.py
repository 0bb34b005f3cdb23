#!/usr/bin/env python3
"""Merge the three x100 chunk JSONs into spark_x100.json for
decades_report.py. Dev-tool only."""
import json, glob
qs, tot = {}, 0.0
for p in sorted(glob.glob("target/decades/spark_x100_*.json")):
    with open(p) as f:
        d = json.load(f)
    qs.update(d["queries"]); tot += d["value"]
out = {"metric": "total", "value": tot, "unit": "sec",
       "queries": qs, "sf": "target/scale/x100"}
with open("target/decades/spark_x100.json", "w") as f:
    json.dump(out, f)
print(json.dumps(out))
