#!/usr/bin/env python3
"""Time the DuckDB oracle queries — the single-node reference point the
Spark bench is compared against at the same scale factor.

Usage: python3 tools/bench_oracle.py <verify_out_dir> <sf_dir> [reps]

Reads <out>/oracle_sql.json (written by graft.Verify), runs each oracle
in DuckDB over the sf tables, and prints per-query seconds (best of
`reps`, default 2) plus the total, as one JSON line. Dev-tool only.
"""
import os, sys, json, time
import duckdb

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from check import TABLES  # single source of truth for the table list


def main() -> None:
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    times = {}
    for name, sql in sorted(oracles.items()):
        best = None
        for _ in range(reps):
            t0 = time.monotonic()
            con.sql(sql).fetchall()
            dt = time.monotonic() - t0
            best = dt if best is None else min(best, dt)
        times[name] = round(best, 3)
    print(json.dumps({"metric": "oracle_total",
                      "value": round(sum(times.values()), 2),
                      "unit": "sec", "queries": times, "sf": sf_dir}))


if __name__ == "__main__":
    main()
