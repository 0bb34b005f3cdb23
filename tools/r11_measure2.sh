#!/usr/bin/env bash
# Round-11 measurement sweep, part 2 — remainder after the serve chunk.
#
# DEVIATION from the r10 protocol (documented in BASELINE.md): all legs
# run SPARK_GRAFT_CPUS=16, not 32. This round's VM kernel
# (6.18.5-fc-v20) deterministically wedges 32-thread JVMs under the
# x100 build load — every thread parks in futex_wait and the VM stops
# responding to SIGQUIT/attach (a lost-futex-wakeup kernel bug, not a
# Spark deadlock: the same binary at 16 threads runs the identical
# subset to completion). Within-run A/B contrasts (full vs sample
# build, r10 vs r11 winnow gate) are unaffected; absolute numbers are
# NOT comparable to r10's 32-thread rows; the x10 anchor ratio is
# CONSERVATIVE for Spark (16 threads vs DuckDB on the same box).
set -uo pipefail
cd /root/repo
OUT=target/decades
mkdir -p "$OUT"
CP="target/benchcp:/opt/spark/jars/*"
run() { # tag sfdir subset runs
  local tag="$1" sfdir="$2" subset="$3" runs="$4"
  echo "=== $tag ($sfdir, runs=$runs) $(date +%T) ==="
  SPARK_GRAFT_SF_DIR="$sfdir" SPARK_GRAFT_CPUS=16 \
  SPARK_GRAFT_BENCH_SUBSET="$subset" SPARK_GRAFT_BENCH_RUNS="$runs" \
    java -Xmx48g --add-exports=java.base/sun.nio.ch=ALL-UNNAMED \
      -cp "$CP" graft.Bench 2>"$OUT/r11_$tag.err" \
      | tail -1 > "$OUT/r11_$tag.json"
  tail -1 "$OUT/r11_$tag.json"
}

# A (redo at 16): full-trained vs sample-trained IVF-SQ8 build, one JVM.
run sq8_build_ab target/scale/x100 "sim_ivfsq8_build,sim_ivfsq8_build_sample" 1

echo "=== winnow AB (x100) $(date +%T) ==="
SPARK_GRAFT_SF_DIR=target/scale/x100 SPARK_GRAFT_CPUS=16 SPARK_GRAFT_AB_ROUNDS=2 \
  java -Xmx48g --add-exports=java.base/sun.nio.ch=ALL-UNNAMED \
    -cp "$CP" graft.tools.WinnowAB 2>"$OUT/r11_winnow_ab.err" \
    | tee "$OUT/r11_winnow_ab.out" | tail -3

echo "=== concurrency (x100) $(date +%T) ==="
SPARK_GRAFT_SF_DIR=target/scale/x100 SPARK_GRAFT_CPUS=16 \
  java -Xmx48g --add-exports=java.base/sun.nio.ch=ALL-UNNAMED \
    -cp "$CP" graft.ConcurrencyBench 2>"$OUT/r11_conc_x100.err" \
    | tail -1 > "$OUT/r11_conc_x100.json"
tail -1 "$OUT/r11_conc_x100.json"

run assemble_sf01 /root/testdata/sf0.1 "sample_token_budget,pipeline_pack" 2
run assemble_x10 target/scale/x10 "sample_token_budget,pipeline_pack" 2
run assemble_x100 target/scale/x100 "sample_token_budget,pipeline_pack" 2

echo "=== anchor refresh: Spark full suite at x10 $(date +%T) ==="
SPARK_GRAFT_SF_DIR=target/scale/x10 SPARK_GRAFT_CPUS=16 \
  java -Xmx48g --add-exports=java.base/sun.nio.ch=ALL-UNNAMED \
    -cp "$CP" graft.Bench 2>"$OUT/r11_spark_x10.err" \
    | tail -1 > "$OUT/r11_spark_x10.json"
tail -1 "$OUT/r11_spark_x10.json"

echo "=== anchor refresh: DuckDB oracle at x10 $(date +%T) ==="
python3 tools/bench_oracle.py /tmp/v_r11 target/scale/x10 2 300 \
  > "$OUT/r11_duck_x10.json" 2>"$OUT/r11_duck_x10.err"
tail -c 2000 "$OUT/r11_duck_x10.json"

echo "=== r11 sweep part 2 done $(date +%T) ==="
