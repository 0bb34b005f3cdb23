#!/usr/bin/env bash
# Round-11 sweep, part 3 — post-fix legs on the embeddingsSpread +
# offset-gate tree (same 16-thread protocol as part 2, same kernel
# caveat documented there).
set -uo pipefail
cd /root/repo
OUT=target/decades
mkdir -p "$OUT"
rm -rf target/benchcp
cp -r target/scala-2.13/classes target/benchcp
CP="target/benchcp:/opt/spark/jars/*"

echo "=== winnow AB redo: offset gate (x100) $(date +%T) ==="
SPARK_GRAFT_SF_DIR=target/scale/x100 SPARK_GRAFT_CPUS=16 SPARK_GRAFT_AB_ROUNDS=2 \
  java -Xmx48g --add-exports=java.base/sun.nio.ch=ALL-UNNAMED \
    -cp "$CP" graft.tools.WinnowAB 2>"$OUT/r11_winnow_ab2.err" \
    | tee "$OUT/r11_winnow_ab2.out" | tail -3

echo "=== sq8 build AB redo: spread scan (x100) $(date +%T) ==="
SPARK_GRAFT_SF_DIR=target/scale/x100 SPARK_GRAFT_CPUS=16 \
SPARK_GRAFT_BENCH_SUBSET="sim_ivfsq8_build,sim_ivfsq8_build_sample" \
SPARK_GRAFT_BENCH_RUNS=1 \
  java -Xmx48g --add-exports=java.base/sun.nio.ch=ALL-UNNAMED \
    -cp "$CP" graft.Bench 2>"$OUT/r11_sq8_build_ab2.err" \
    | tail -1 > "$OUT/r11_sq8_build_ab2.json"
tail -1 "$OUT/r11_sq8_build_ab2.json"

echo "=== anchor refresh: Spark full suite at x10 $(date +%T) ==="
SPARK_GRAFT_SF_DIR=target/scale/x10 SPARK_GRAFT_CPUS=16 \
  java -Xmx48g --add-exports=java.base/sun.nio.ch=ALL-UNNAMED \
    -cp "$CP" graft.Bench 2>"$OUT/r11_spark_x10.err" \
    | tail -1 > "$OUT/r11_spark_x10.json"
tail -1 "$OUT/r11_spark_x10.json"

echo "=== anchor refresh: DuckDB oracle at x10 $(date +%T) ==="
python3 tools/bench_oracle.py /tmp/v_r11b target/scale/x10 2 300 \
  > "$OUT/r11_duck_x10.json" 2>"$OUT/r11_duck_x10.err"
tail -c 2000 "$OUT/r11_duck_x10.json"

echo "=== r11 sweep part 3 done $(date +%T) ==="
