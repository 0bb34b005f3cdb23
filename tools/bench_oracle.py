#!/usr/bin/env python3
"""Time the DuckDB oracle queries — the single-node reference point the
Spark bench is compared against at the same scale factor.

Usage: python3 tools/bench_oracle.py <verify_out_dir> <sf_dir> [reps] [timeout_s]

Reads <out>/oracle_sql.json (written by graft.Verify), runs each oracle
in DuckDB over the sf tables, and prints per-query seconds (best of
`reps`, default 2) plus the total, as one JSON line. A query that blows
the spill cap or the per-query timeout is recorded as -1 (DNF) instead
of filling the disk / hanging the run — at larger scale factors some
single-node plans simply stop being runnable, which is itself the
measurement. Dev-tool only.
"""
import os, sys, json, time, threading
import duckdb

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from check import TABLES  # single source of truth for the table list


def main() -> None:
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    timeout_s = float(sys.argv[4]) if len(sys.argv) > 4 else 300.0
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = duckdb.connect()
    con.sql("SET max_temp_directory_size='24GB'")
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    times = {}
    for name, sql in sorted(oracles.items()):
        best = None
        for _ in range(reps):
            # The timer only interrupts while THIS query is still
            # running: without the flag, a timer firing in the gap
            # between query completion and cancel() would land its
            # interrupt on the NEXT query sharing the connection,
            # recording a spurious DNF.
            done = threading.Event()
            timer = threading.Timer(
                timeout_s, lambda: None if done.is_set() else con.interrupt())
            timer.start()
            t0 = time.monotonic()
            try:
                con.sql(sql).fetchall()
                done.set()
                dt = time.monotonic() - t0
                best = dt if best is None else min(best, dt)
            except Exception as e:
                done.set()
                print(f"[oracle-bench] {name} DNF after "
                      f"{time.monotonic() - t0:.0f}s: "
                      f"{str(e).splitlines()[0][:120]}", file=sys.stderr)
                best = best if best is not None else -1.0
                timer.cancel()
                break
            finally:
                done.set()
                timer.cancel()
        times[name] = round(best, 3)
    finished = {k: v for k, v in times.items() if v >= 0}
    print(json.dumps({"metric": "oracle_total",
                      "value": round(sum(finished.values()), 2),
                      "unit": "sec", "queries": times,
                      "dnf": sorted(k for k, v in times.items() if v < 0),
                      "sf": sf_dir}))


if __name__ == "__main__":
    main()
