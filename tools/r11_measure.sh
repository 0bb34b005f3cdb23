#!/usr/bin/env bash
# Round-11 measurement sweep (sequential, one JVM per chunk, frozen
# classpath so concurrent dev compiles can't swap classes mid-run):
#   A. x100 matched-condition control: full-trained vs sample-trained
#      IVF-SQ8 build in one JVM (runs=1, heavy-build ledger protocol).
#   B. x100 serve chunk for the r11 additions (sample-SQ8 serve+recall,
#      adaptive filtered ANN, IVF-PQ serve+recall), min-of-two.
#   C. x100 WinnowAB: r10 md5-gate vs r11 two-stage gate, alternating.
#   D. x100 ConcurrencyBench: third row of the concurrent-serve table.
#   E. sample_token_budget + pipeline_pack at sf0.1 / x10 / x100 — the
#      training-data assembly lane's two-decade rows.
#   F. anchor refresh at x10: Spark full suite (min-of-two) then the
#      DuckDB oracle over the same query set (bench_oracle.py).
set -uo pipefail
cd /root/repo
OUT=target/decades
mkdir -p "$OUT"
rm -rf target/benchcp
cp -r target/scala-2.13/classes target/benchcp
CP="target/benchcp:/opt/spark/jars/*"
run() { # tag sfdir subset runs
  local tag="$1" sfdir="$2" subset="$3" runs="$4"
  echo "=== $tag ($sfdir, runs=$runs) $(date +%T) ==="
  SPARK_GRAFT_SF_DIR="$sfdir" SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_BENCH_SUBSET="$subset" SPARK_GRAFT_BENCH_RUNS="$runs" \
    java -Xmx96g --add-exports=java.base/sun.nio.ch=ALL-UNNAMED \
      -cp "$CP" graft.Bench 2>"$OUT/r11_$tag.err" \
      | tail -1 > "$OUT/r11_$tag.json"
  tail -1 "$OUT/r11_$tag.json"
}

run sq8_build_ab target/scale/x100 "sim_ivfsq8_build,sim_ivfsq8_build_sample" 1
run serve_new target/scale/x100 "sim_ann_ivfsq8_sample,sim_ann_ivfsq8_sample_recall,sim_ann_filtered_adaptive,sim_ann_ivfpq,sim_ann_ivfpq_recall" 2

echo "=== winnow AB (x100) $(date +%T) ==="
SPARK_GRAFT_SF_DIR=target/scale/x100 SPARK_GRAFT_CPUS=32 SPARK_GRAFT_AB_ROUNDS=2 \
  java -Xmx96g --add-exports=java.base/sun.nio.ch=ALL-UNNAMED \
    -cp "$CP" graft.tools.WinnowAB 2>"$OUT/r11_winnow_ab.err" \
    | tee "$OUT/r11_winnow_ab.out" | tail -3

echo "=== concurrency (x100) $(date +%T) ==="
SPARK_GRAFT_SF_DIR=target/scale/x100 SPARK_GRAFT_CPUS=32 \
  java -Xmx96g --add-exports=java.base/sun.nio.ch=ALL-UNNAMED \
    -cp "$CP" graft.ConcurrencyBench 2>"$OUT/r11_conc_x100.err" \
    | tail -1 > "$OUT/r11_conc_x100.json"
tail -1 "$OUT/r11_conc_x100.json"

run assemble_sf01 /root/testdata/sf0.1 "sample_token_budget,pipeline_pack" 2
run assemble_x10 target/scale/x10 "sample_token_budget,pipeline_pack" 2
run assemble_x100 target/scale/x100 "sample_token_budget,pipeline_pack" 2

echo "=== anchor refresh: Spark full suite at x10 $(date +%T) ==="
SPARK_GRAFT_SF_DIR=target/scale/x10 SPARK_GRAFT_CPUS=32 \
  java -Xmx96g --add-exports=java.base/sun.nio.ch=ALL-UNNAMED \
    -cp "$CP" graft.Bench 2>"$OUT/r11_spark_x10.err" \
    | tail -1 > "$OUT/r11_spark_x10.json"
tail -1 "$OUT/r11_spark_x10.json"

echo "=== anchor refresh: DuckDB oracle at x10 $(date +%T) ==="
python3 tools/bench_oracle.py /tmp/v_r11 target/scale/x10 2 300 \
  > "$OUT/r11_duck_x10.json" 2>"$OUT/r11_duck_x10.err"
tail -c 2000 "$OUT/r11_duck_x10.json"

echo "=== r11 sweep done $(date +%T) ==="
