#!/usr/bin/env bash
# Post-documentsSpread re-measure of the dedup/graph rows at all three
# scales (same per-scale protocol as the pre-fix columns: runs=2 at
# sf0.1/x10, runs=1 at x100).
set -uo pipefail
cd /root/repo
OUT=target/decades
mkdir -p "$OUT"
CP="target/scala-2.13/classes:/opt/spark/jars/*"
SUBSET="dedup_minhash_lsh,dedup_fuzzy_edit,dedup_substring,dedup_cc,graph_pagerank"
run() { # tag dir runs
  echo "=== postfix $1 (runs=$3) $(date +%T) ==="
  SPARK_GRAFT_SF_DIR="$2" SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_BENCH_SUBSET="$SUBSET" SPARK_GRAFT_BENCH_RUNS="$3" \
    java -Xmx96g --add-exports=java.base/sun.nio.ch=ALL-UNNAMED \
      -cp "$CP" graft.Bench 2>"$OUT/postfix_$1.err" \
      | tail -1 > "$OUT/postfix_$1.json"
  tail -1 "$OUT/postfix_$1.json"
}
run x100 target/scale/x100 1
run x10 target/scale/x10 2
run sf01 /root/testdata/sf0.1 2
echo "=== postfix done $(date +%T) ==="
