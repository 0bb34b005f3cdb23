#!/usr/bin/env bash
# Resumable x100 decade run: three chunks, each its own JVM + JSON,
# so a mid-run kill loses at most one chunk. Serving chunk keeps the
# min-of-two protocol; the heavy dedup/graph chunks run once (noted
# in BASELINE.md).
set -uo pipefail
cd /root/repo
OUT=target/decades
mkdir -p "$OUT"
CP="target/scala-2.13/classes:/opt/spark/jars/*"
run() { # name subset runs
  local name="$1" subset="$2" runs="$3"
  echo "=== x100 chunk $name (runs=$runs) $(date +%T) ==="
  SPARK_GRAFT_SF_DIR=target/scale/x100 SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_BENCH_SUBSET="$subset" SPARK_GRAFT_BENCH_RUNS="$runs" \
    java -Xmx96g --add-exports=java.base/sun.nio.ch=ALL-UNNAMED \
      -cp "$CP" graft.Bench 2>"$OUT/spark_x100_$name.err" \
      | tail -1 > "$OUT/spark_x100_$name.json"
  tail -1 "$OUT/spark_x100_$name.json"
}
run serve "sim_ivf_build_sqrt,sim_ann_indexed_sqrt,sim_ivfsq8_build,sim_ann_ivfsq8,text_fts_build,text_bm25_indexed,text_bm25_search,text_fts_churn" 2
run dedup "dedup_minhash_lsh,dedup_fuzzy_edit,dedup_substring" 1
run graph "dedup_cc,graph_pagerank" 1
echo "=== x100 all chunks done $(date +%T) ==="
