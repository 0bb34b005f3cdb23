#!/usr/bin/env bash
# Calm-box retry for the three environment-bounded x100 shuffle rows
# (VERDICT r12 task 3), GATED on the shuffle-calib band BASELINE.md
# pinned this round (healthy 32-thread ≈ 0.83–1.06 s):
#   1. cheap pre-gate: a probe-only Bench JVM (empty query subset —
#      the calib legs run regardless) must read shuffle calib <= GATE
#      before the chunk starts;
#   2. the chunk's own calib decides ACCEPTANCE: a pass whose
#      shuffle_start/end exceed the band ran under the documented
#      burst-degradation mode and is an upper bound, not a pin.
# Retries until a pass lands in-band or attempts run out.
set -uo pipefail
cd /root/repo
OUT=target/decades
mkdir -p "$OUT"
if [ ! -d target/benchcp ]; then cp -r target/scala-2.13/classes target/benchcp; fi
CP="target/benchcp:/opt/spark/jars/*"
CPUS="${SPARK_GRAFT_CPUS:-32}"
GATE="${SPARK_GRAFT_SHUF_GATE:-1.10}"
ATTEMPTS="${SPARK_GRAFT_ATTEMPTS:-3}"
PAUSE="${SPARK_GRAFT_PAUSE:-300}"

shuf_vals() { # json-file -> "start end"
  python3 - "$1" <<'PY'
import json,sys
c=json.load(open(sys.argv[1]))["calib"]
print(c["shuffle_start"], c["shuffle_end"])
PY
}

for i in $(seq 1 "$ATTEMPTS"); do
  echo "=== r13 dedup retry attempt $i: pre-gate probe $(date +%T) ==="
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.001 SPARK_GRAFT_CPUS="$CPUS" \
  SPARK_GRAFT_BENCH_SUBSET=__probe_only__ \
  SPARK_GRAFT_BENCH_FULL="$OUT/r13_probe.json" \
    java -Xmx16g --add-exports=java.base/sun.nio.ch=ALL-UNNAMED \
      -cp "$CP" graft.Bench 2>/dev/null | tail -1 > "$OUT/r13_probe.json"
  read PS PE < <(shuf_vals "$OUT/r13_probe.json")
  echo "probe shuffle calib: start=$PS end=$PE (gate $GATE)"
  if python3 -c "import sys; sys.exit(0 if float('$PS')<=$GATE and float('$PE')<=$GATE else 1)"; then
    echo "=== gate OPEN — running x100 dedup chunk $(date +%T) ==="
    SPARK_GRAFT_SF_DIR=target/scale/x100 SPARK_GRAFT_CPUS="$CPUS" \
    SPARK_GRAFT_BENCH_SUBSET="dedup_minhash_lsh,dedup_fuzzy_edit,dedup_substring" \
    SPARK_GRAFT_BENCH_RUNS=1 \
    SPARK_GRAFT_BENCH_FULL="$OUT/r13_dedup_retry${i}_full.json" \
      java -Xmx96g --add-exports=java.base/sun.nio.ch=ALL-UNNAMED \
        -cp "$CP" graft.Bench 2>"$OUT/r13_dedup_retry$i.err" \
        | tail -1 > "$OUT/r13_dedup_retry$i.json"
    tail -1 "$OUT/r13_dedup_retry$i.json"
    read CS CE < <(shuf_vals "$OUT/r13_dedup_retry$i.json")
    echo "chunk shuffle calib: start=$CS end=$CE"
    if python3 -c "import sys; sys.exit(0 if float('$CS')<=$GATE and float('$CE')<=$GATE else 1)"; then
      echo "=== ACCEPTED: in-band pass on attempt $i $(date +%T) ==="
      exit 0
    fi
    echo "chunk ran degraded (calib out of band) — upper bound only"
  else
    echo "gate CLOSED — box busy"
  fi
  [ "$i" -lt "$ATTEMPTS" ] && sleep "$PAUSE"
done
echo "=== no in-band pass in $ATTEMPTS attempts ==="
exit 2
