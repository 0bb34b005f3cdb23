#!/usr/bin/env bash
# Round-13 anchor refresh (VERDICT r12 task 7): the 2x-gate number
# re-measured on the FULL 200-query suite at the 10x replica (~sf1),
# restored 32-thread protocol, min-of-two; DuckDB oracle timed over
# the same tables from the same oracle_sql.json; ratio via
# tools/anchor_ratio.py (per-engine DNF lists).
set -uo pipefail
cd /root/repo
OUT=target/decades
mkdir -p "$OUT"
rm -rf target/benchcp
cp -r target/scala-2.13/classes target/benchcp
CP="target/benchcp:/opt/spark/jars/*"
echo "=== r13 anchor: spark full suite at x10 $(date +%T) ==="
SPARK_GRAFT_SF_DIR=target/scale/x10 SPARK_GRAFT_CPUS=32 \
SPARK_GRAFT_BENCH_FULL="$OUT/r13_anchor_spark.json" \
  java -Xmx96g --add-exports=java.base/sun.nio.ch=ALL-UNNAMED \
    -cp "$CP" graft.Bench 2>"$OUT/r13_anchor_spark.err" | tail -1 \
    > /dev/null
tail -c 400 "$OUT/r13_anchor_spark.json"; echo
echo "=== r13 anchor: duckdb oracle at x10 $(date +%T) ==="
python3 tools/bench_oracle.py target/v13full target/scale/x10 2 300 \
  2>"$OUT/r13_anchor_duck.err" > "$OUT/r13_anchor_duck.json"
echo "=== r13 anchor: ratio $(date +%T) ==="
python3 tools/anchor_ratio.py "$OUT/r13_anchor_spark.json" \
  "$OUT/r13_anchor_duck.json" | tee "$OUT/r13_anchor_ratio.json"
echo "=== r13 anchor done $(date +%T) ==="
