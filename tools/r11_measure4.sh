#!/usr/bin/env bash
# Round-11 sweep, part 4 — anchor legs on the FINAL tree (md5-prefix
# winnow gate restored after the A/B refutation; embeddingsSpread in).
# Same 16-thread protocol and kernel caveat as parts 2-3.
set -uo pipefail
cd /root/repo
OUT=target/decades
mkdir -p "$OUT"
rm -rf target/benchcp
cp -r target/scala-2.13/classes target/benchcp
CP="target/benchcp:/opt/spark/jars/*"

echo "=== fresh oracle dump + winnow revert spot-check $(date +%T) ==="
rm -rf /tmp/v_r11c
SPARK_GRAFT_CPUS=16 SPARK_GRAFT_VERIFY_SUBSET=dedup_substring_winnow \
  java -Xmx16g --add-exports=java.base/sun.nio.ch=ALL-UNNAMED \
    -cp "$CP" graft.Verify /root/testdata/sf0.01 /tmp/v_r11c \
    2>"$OUT/r11_vdump.err"
python3 tools/check.py /tmp/v_r11c /root/testdata/sf0.01 2>/dev/null | tail -2

echo "=== anchor refresh: Spark full suite at x10 $(date +%T) ==="
SPARK_GRAFT_SF_DIR=target/scale/x10 SPARK_GRAFT_CPUS=16 \
  java -Xmx48g --add-exports=java.base/sun.nio.ch=ALL-UNNAMED \
    -cp "$CP" graft.Bench 2>"$OUT/r11_spark_x10.err" \
    | tail -1 > "$OUT/r11_spark_x10.json"
tail -1 "$OUT/r11_spark_x10.json"

echo "=== anchor refresh: DuckDB oracle at x10 $(date +%T) ==="
python3 tools/bench_oracle.py /tmp/v_r11c target/scale/x10 2 300 \
  > "$OUT/r11_duck_x10.json" 2>"$OUT/r11_duck_x10.err"
tail -c 2000 "$OUT/r11_duck_x10.json"

echo "=== r11 sweep part 4 done $(date +%T) ==="
