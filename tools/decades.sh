#!/usr/bin/env bash
# Second-decade growth measurement (round-9 task 2): run the flagship
# serving/dedup/graph set at sf0.1, its 10x replica, and its 100x
# replica (tools/scale_up.py outputs under target/scale), Spark side
# and DuckDB side, and leave the JSON lines under target/decades/.
#   bash tools/decades.sh [subset_csv]
set -uo pipefail
cd /root/repo
SUBSET="${1:-dedup_fuzzy_edit,dedup_substring,dedup_minhash_lsh,dedup_cc,graph_pagerank,sim_ivf_build_sqrt,sim_ann_indexed_sqrt,sim_ivfsq8_build,sim_ann_ivfsq8,text_fts_build,text_bm25_indexed,text_bm25_search,text_fts_churn}"
OUT=target/decades
mkdir -p "$OUT"

CP="target/scala-2.13/classes:$(ls -d /opt/spark/jars)/*"

for tag in sf01:/root/testdata/sf0.1 x10:target/scale/x10 x100:target/scale/x100; do
  name="${tag%%:*}"; dir="${tag#*:}"
  echo "=== spark $name ($dir) ==="
  SPARK_GRAFT_SF_DIR="$dir" SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_BENCH_SUBSET="$SUBSET" \
    java -Xmx96g --add-exports=java.base/sun.nio.ch=ALL-UNNAMED \
      -cp "$CP" graft.Bench 2>"$OUT/spark_$name.err" \
      | tail -1 > "$OUT/spark_$name.json"
  tail -1 "$OUT/spark_$name.json"
done
