#!/usr/bin/env bash
# Round-15 measurement sweep (VERDICT r14 tasks 2, 4, 6 + the r15
# FTS serve-only row), one JVM per chunk via the per-query certified
# protocol (certified_pin.sh). Since r15 every chunk self-retries its
# flagged rows in-JVM (Bench's end-of-suite retry pass), so one calm
# window inside the retry budget certifies a row without re-running
# the whole chunk.
#
#   A. the new stream_fts_serve_only row at sf0.1, beside the full
#      lifecycle row and the batch-built serving twin it is compared
#      against (task 3 closure: "a certified sf0.1 row").
#   B. the mm dedup family's SECOND decade (x100) — the only
#      LLM-pipeline family without one (task 2); runs >= 2 per the
#      JIT rule (a runs=1 reading times 20-120 s of one-time codegen
#      warm-up, not the ~6 s plan — BASELINE.md r14 adjudication).
#   C. certified x100 pin for dedup_substring_winnow, the production
#      substring path (task 4; r10 read 21.8 s uncertified).
#   D. 2x-gate re-anchor on the FULL suite at x10 (~sf1): Spark bench
#      + DuckDB oracle twin over the same tables, ratio via
#      anchor_ratio.py (task 6; standing r13 anchor 0.347x/200 q).
set -uo pipefail
cd /root/repo

if [ ! -e target/scale/x10/documents.parquet ]; then
  echo "building x10 replica..."
  python3 tools/scale_up.py /root/testdata/sf0.1 target/scale/x10 10
fi
if [ ! -e target/scale/x100/documents.parquet ]; then
  echo "building x100 replica..."
  python3 tools/scale_up.py /root/testdata/sf0.1 target/scale/x100 100
fi

tools/certified_pin.sh r15_ftsserve_sf01 /root/testdata/sf0.1 \
  "stream_fts_serve_only,stream_fts_serve,text_bm25_indexed" 2

tools/certified_pin.sh r15_mm_x100 target/scale/x100 \
  "mm_dedup_signature,mm_dedup_collapsed,mm_dedup_incremental" 2

tools/certified_pin.sh r15_winnow_x100 target/scale/x100 \
  "dedup_substring_winnow" 2

OUT=measurements
mkdir -p "$OUT"
CP="target/benchcp:/opt/spark/jars/*"
echo "=== r15 anchor: spark full suite at x10 $(date +%T) ==="
rm -f "$OUT/r15_anchor_spark.json"
SPARK_GRAFT_SF_DIR=target/scale/x10 SPARK_GRAFT_CPUS=32 \
SPARK_GRAFT_BENCH_FULL="$OUT/r15_anchor_spark.json" \
  java -Xmx96g --add-exports=java.base/sun.nio.ch=ALL-UNNAMED \
    -cp "$CP" graft.Bench 2>"$OUT/r15_anchor_spark.err" | tail -1 \
    > /dev/null
RC=$?
if [ "$RC" -ne 0 ] || [ ! -s "$OUT/r15_anchor_spark.json" ]; then
  echo "ABORT: anchor bench rc=$RC or JSON missing" >&2
  exit 1
fi
tail -c 400 "$OUT/r15_anchor_spark.json"; echo
echo "=== r15 anchor: duckdb oracle at x10 $(date +%T) ==="
# /tmp/v1 is a fresh Verify dump carrying oracle_sql.json for all
# queries; regenerate with graft.Verify if absent
VDIR="${SPARK_GRAFT_VERIFY_DIR:-/tmp/v1}"
python3 tools/bench_oracle.py "$VDIR" target/scale/x10 2 300 \
  2>"$OUT/r15_anchor_duck.err" > "$OUT/r15_anchor_duck.json"
echo "=== r15 anchor: ratio $(date +%T) ==="
python3 tools/anchor_ratio.py "$OUT/r15_anchor_spark.json" \
  "$OUT/r15_anchor_duck.json" | tee "$OUT/r15_anchor_ratio.json"
echo "=== r15 sweep done $(date +%T) ==="
