#!/usr/bin/env bash
# Round-12 second sweep:
#   A. ConcurrencyBench third-decade re-pin at the restored 32-thread
#      protocol (r11's x100 row was 16-thread, cross-round void).
#   B. fuzzy_edit x100 calm-box retry (both first-sweep passes read
#      ~360 s vs r10's 48.7 — decide environment vs real).
#   C. Two decades for the r12 operators: stream_ivf_serve and
#      mm_dedup_signature at sf0.1 / x10 / x100.
#   D. dedup_minhash_lsh x10 at 16 vs 32 threads (close the 19.3-vs-
#      9.1-anchor question: thread width, not code).
set -uo pipefail
cd /root/repo
OUT=target/decades
mkdir -p "$OUT"
rm -rf target/benchcp
cp -r target/scala-2.13/classes target/benchcp
CP="target/benchcp:/opt/spark/jars/*"
run() { # tag sfdir subset runs cpus
  local tag="$1" sfdir="$2" subset="$3" runs="$4" cpus="$5"
  echo "=== r12b $tag ($sfdir, cpus=$cpus, runs=$runs) $(date +%T) ==="
  SPARK_GRAFT_SF_DIR="$sfdir" SPARK_GRAFT_CPUS="$cpus" \
  SPARK_GRAFT_BENCH_SUBSET="$subset" SPARK_GRAFT_BENCH_RUNS="$runs" \
    java -Xmx96g --add-exports=java.base/sun.nio.ch=ALL-UNNAMED \
      -cp "$CP" graft.Bench 2>"$OUT/r12b_$tag.err" \
      | tail -1 > "$OUT/r12b_$tag.json"
  tail -1 "$OUT/r12b_$tag.json"
}

echo "=== r12b concurrency (x100, 32t) $(date +%T) ==="
SPARK_GRAFT_SF_DIR=target/scale/x100 SPARK_GRAFT_CPUS=32 \
  java -Xmx96g --add-exports=java.base/sun.nio.ch=ALL-UNNAMED \
    -cp "$CP" graft.ConcurrencyBench 2>"$OUT/r12b_conc_x100.err" \
    | tail -1 > "$OUT/r12b_conc_x100.json"
tail -1 "$OUT/r12b_conc_x100.json"

run fuzzy_retry target/scale/x100 "dedup_fuzzy_edit" 1 32
run newops_sf01 /root/testdata/sf0.1 "stream_ivf_serve,mm_dedup_signature" 2 32
run newops_x10 target/scale/x10 "stream_ivf_serve,mm_dedup_signature" 2 32
run newops_x100 target/scale/x100 "stream_ivf_serve,mm_dedup_signature" 2 32
run mh_x10_16t target/scale/x10 "dedup_minhash_lsh" 2 16
run mh_x10_32t target/scale/x10 "dedup_minhash_lsh" 2 32
echo "=== r12b all done $(date +%T) ==="
