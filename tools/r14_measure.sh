#!/usr/bin/env bash
# Round-14 measurement sweep (VERDICT r13 tasks 3, 5, 6), one JVM per
# chunk via the per-query certified protocol (certified_pin.sh):
#   A. re-pin the two r13 burst-flagged outliers at sf0.1
#      (dedup_canonical 20.6 s legs 1.14/4.33, graph_triangles 7.46 s)
#      — expected ~4-8 s / ~3-4 s per their closed ledgers.
#   B. mm family at x10 (fresh tools/scale_up.py replica): the r13
#      "replica-clique" diagnosis for mm_dedup_signature does NOT
#      reproduce structurally (x10 content-family histogram is 49 840
#      singletons + 80 pairs; max band bucket 12; DuckDB flat 7.0 s vs
#      collapsed 4.6 s, not 17.2 vs 3.1) — re-measure the flat form
#      under certified legs to adjudicate burst-vs-replica.
#   C. the new serve-only streamed rows at sf0.1 (warm seed+stream in
#      the Bench index registry, timed row = serve alone).
set -uo pipefail
cd /root/repo

if [ ! -d target/scale/x10/documents.parquet ] && [ ! -f target/scale/x10/documents.parquet ]; then
  echo "building x10 replica..."
  python3 tools/scale_up.py /root/testdata/sf0.1 target/scale/x10 10
fi

tools/certified_pin.sh r14_outliers_sf01 /root/testdata/sf0.1 \
  "dedup_canonical,graph_triangles" 2
# runs=3: a single-run reading of the mm family times its one-time
# codegen/JIT warm-up (20-120 s) instead of the 5.6-5.9 s steady state
# (BASELINE.md r14 adjudication) — min-of-N with N >= 2 is mandatory
tools/certified_pin.sh r14_mm_x10 target/scale/x10 \
  "mm_dedup_signature,mm_dedup_collapsed,mm_dedup_incremental" 3
tools/certified_pin.sh r14_serveonly_sf01 /root/testdata/sf0.1 \
  "stream_ivfsq8_serve_only,stream_ivfpq_serve_only,stream_ivfsq8_serve,stream_ivfpq_serve" 2

#   D. the deliberate CLIQUE fixture (scale_up clique_mod=5: 20% of
#      docs in 10-deep byte-identical families) — the shape the
#      exact-collapse exists for; flat should blow up with the clique
#      term, collapsed should not.
if [ ! -e target/scale/x10c/documents.parquet ]; then
  echo "building x10 clique replica (clique_mod=5)..."
  python3 tools/scale_up.py /root/testdata/sf0.1 target/scale/x10c 10 5
fi
tools/certified_pin.sh r14_mm_x10clique target/scale/x10c \
  "mm_dedup_signature,mm_dedup_collapsed" 3
echo "=== r14 sweep done $(date +%T) ==="
