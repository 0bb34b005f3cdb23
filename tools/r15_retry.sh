#!/usr/bin/env bash
# Opportunistic certification retries for the r15 open rows (the
# r14_retry.sh pattern): short rows certify whenever a calm minute
# lands; each attempt is a fresh certified_pin chunk and a chunk stops
# once every row in its attempt reads CERTIFIED.
set -uo pipefail
cd /root/repo
ATTEMPTS="${1:-4}"
PAUSE="${2:-120}"

all_cert() {
  python3 - "$1" <<'PY'
import json, sys
try:
    d = json.load(open(sys.argv[1]))
except Exception:
    sys.exit(1)
c = d["calib"].get("cert") or {}
sys.exit(0 if c and all(c.values()) else 1)
PY
}

skip_x100=0
if [ ! -d target/scale/x100 ]; then
  echo "target/scale/x100 missing — build it first (tools/scale_up.py); skipping x100 chunk" >&2
  skip_x100=1
fi
done_x100=$(( 1 - skip_x100 )); done_serve=1
for i in $(seq 1 "$ATTEMPTS"); do
  if [ "$done_x100" -ne 0 ]; then
    tools/certified_pin.sh "r15_mmq_c$i" target/scale/x100 \
      "mm_dedup_signature,mm_dedup_incremental" 2 | tail -3
    all_cert "measurements/r15_mmq_c$i.json" && done_x100=0
  fi
  if [ "$done_serve" -ne 0 ]; then
    tools/certified_pin.sh "r15_serve_c$i" /root/testdata/sf0.1 \
      "stream_ivf_serve_only,text_bm25_indexed" 2 | tail -3
    all_cert "measurements/r15_serve_c$i.json" && done_serve=0
  fi
  if [ "$done_x100" -eq 0 ] && [ "$done_serve" -eq 0 ]; then
    # a skipped chunk never certified anything — say so (ADVICE r15)
    if [ "$skip_x100" -eq 1 ]; then
      echo "serve chunk certified after attempt $i (x100 chunk SKIPPED: fixture missing)"
    else
      echo "all chunks certified after attempt $i"
    fi
    break
  fi
  sleep "$PAUSE"
done
