#!/usr/bin/env bash
# Round-12 measurement sweep (sequential, one JVM per chunk, frozen
# classpath so dev compiles can't swap classes mid-run):
#   A. x100 matched-condition control: full-trained vs sample-trained
#      IVF-PQ build in one JVM (runs=1 — heavy-build ledger protocol).
#   B-E. x100 re-pin of the canonical two-decade chunks at ONE protocol
#      (VERDICT r11 task 4): serve (min-of-two), dedup, graph, enrich.
#      Run at 32 threads; if the r11 kernel wedge recurs, re-run with
#      SPARK_GRAFT_CPUS=16 and record 16-thread as canonical.
#   F. PQ recall/compression frontier at sf0.1 (VERDICT r11 task 3).
# Every Bench chunk emits calib fields (r12) — per-chunk environment
# health rides in the JSON.
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
  echo "=== r12 $tag ($sfdir, cpus=$CPUS, runs=$runs) $(date +%T) ==="
  SPARK_GRAFT_SF_DIR="$sfdir" SPARK_GRAFT_CPUS="$CPUS" \
  SPARK_GRAFT_BENCH_SUBSET="$subset" SPARK_GRAFT_BENCH_RUNS="$runs" \
    java -Xmx96g --add-exports=java.base/sun.nio.ch=ALL-UNNAMED \
      -cp "$CP" graft.Bench 2>"$OUT/r12_$tag.err" \
      | tail -1 > "$OUT/r12_$tag.json"
  tail -1 "$OUT/r12_$tag.json"
}

run pq_build_ab target/scale/x100 "sim_ivfpq_build,sim_ivfpq_build_sample" 1
run serve target/scale/x100 "sim_ivf_build_sqrt,sim_ann_indexed_sqrt,sim_ivfsq8_build,sim_ann_ivfsq8,text_fts_build,text_bm25_indexed,text_bm25_search,text_fts_churn" 2
run dedup target/scale/x100 "dedup_minhash_lsh,dedup_fuzzy_edit,dedup_substring" 1
run graph target/scale/x100 "dedup_cc,graph_pagerank" 1
run enrich target/scale/x100 "domain_vehicle_enrich,domain_people_enrich,domain_safety_enrich,domain_school_enrich,domain_retail_enrich,domain_slot_sessionize,mm_byte_metrics,mm_chunk_sample,mm_segments" 2

echo "=== r12 PQ frontier (sf0.1) $(date +%T) ==="
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS="$CPUS" \
  java -Xmx96g --add-exports=java.base/sun.nio.ch=ALL-UNNAMED \
    -cp "$CP" graft.tools.PqFrontier 2>"$OUT/r12_pq_frontier.err" \
    | tee "$OUT/r12_pq_frontier.out"
echo "=== r12 all chunks done $(date +%T) ==="
