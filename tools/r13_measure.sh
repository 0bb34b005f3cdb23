#!/usr/bin/env bash
# Round-13 measurement sweep (sequential, one JVM per chunk, frozen
# classpath so dev compiles can't swap classes mid-run):
#   A. stream_stream_join isolated re-run ×3 (VERDICT r12 task 1):
#      min-of-two per JVM, three JVMs — closes the r12 in-suite-outlier
#      ledger entry AND yields 6 shuffle-calib + 6 CPU-calib samples to
#      pin the healthy bands in BASELINE.md.
#   B. calm-box x100 pass for the three environment-bounded shuffle
#      rows (VERDICT r12 task 3): dedup_minhash_lsh, dedup_fuzzy_edit,
#      dedup_substring, runs=1 (heavy-row ledger protocol, same as
#      r12). The chunk's own calib fields gate acceptance: a pin only
#      replaces the r12 upper bound if shuffle calib reads in-band.
set -uo pipefail
cd /root/repo
OUT=target/decades
mkdir -p "$OUT"
rm -rf target/benchcp
cp -r target/scala-2.13/classes target/benchcp
CP="target/benchcp:/opt/spark/jars/*"
CPUS="${SPARK_GRAFT_CPUS:-32}"
run() { # tag sfdir subset runs
  local tag="$1" sfdir="$2" subset="$3" runs="$4"
  echo "=== r13 $tag ($sfdir, cpus=$CPUS, runs=$runs) $(date +%T) ==="
  SPARK_GRAFT_SF_DIR="$sfdir" SPARK_GRAFT_CPUS="$CPUS" \
  SPARK_GRAFT_BENCH_SUBSET="$subset" SPARK_GRAFT_BENCH_RUNS="$runs" \
  SPARK_GRAFT_BENCH_FULL="$OUT/r13_${tag}_full.json" \
    java -Xmx96g --add-exports=java.base/sun.nio.ch=ALL-UNNAMED \
      -cp "$CP" graft.Bench 2>"$OUT/r13_$tag.err" \
      | tail -1 > "$OUT/r13_$tag.json"
  tail -1 "$OUT/r13_$tag.json"
}

run ssj1 /root/testdata/sf0.1 "stream_stream_join" 2
run ssj2 /root/testdata/sf0.1 "stream_stream_join" 2
run ssj3 /root/testdata/sf0.1 "stream_stream_join" 2
run dedup target/scale/x100 "dedup_minhash_lsh,dedup_fuzzy_edit,dedup_substring" 1
echo "=== r13 all chunks done $(date +%T) ==="
