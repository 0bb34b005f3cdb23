#!/usr/bin/env bash
# Re-measure the sf0.1 decade column with the current tree (the 06:28
# run predated the SQ8 decoded-dot ranking fix, ad538a3). Same
# protocol as the x10 column: one JVM, full 13-query subset, runs=2.
set -uo pipefail
cd /root/repo
SUBSET="dedup_fuzzy_edit,dedup_substring,dedup_minhash_lsh,dedup_cc,graph_pagerank,sim_ivf_build_sqrt,sim_ann_indexed_sqrt,sim_ivfsq8_build,sim_ann_ivfsq8,text_fts_build,text_bm25_indexed,text_bm25_search,text_fts_churn"
OUT=target/decades
mkdir -p "$OUT"
CP="target/scala-2.13/classes:/opt/spark/jars/*"
echo "=== spark sf01 re-run $(date +%T) ==="
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
SPARK_GRAFT_BENCH_SUBSET="$SUBSET" \
  java -Xmx96g --add-exports=java.base/sun.nio.ch=ALL-UNNAMED \
    -cp "$CP" graft.Bench 2>"$OUT/spark_sf01.err" \
    | tail -1 > "$OUT/spark_sf01.json"
tail -1 "$OUT/spark_sf01.json"
