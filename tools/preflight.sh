#!/usr/bin/env bash
# Snapshot preflight (VERDICT r6 #2): the three gates every round-end
# commit must pass, in driver order. Run from the repo root; paste the
# three RESULT lines into the snapshot commit message.
#   bash tools/preflight.sh [sf_dir]
set -uo pipefail
SF="${1:-/root/testdata/sf0.01}"
OUT="$(mktemp -d /tmp/preflight.XXXXXX)"
r1=FAIL; r2=FAIL; r3=FAIL

sbt -batch compile >"$OUT/compile.log" 2>&1 && r1=OK
echo "RESULT compile: $r1"
[ "$r1" = OK ] || { tail -20 "$OUT/compile.log"; exit 1; }

sbt -batch test >"$OUT/test.log" 2>&1 && r2=OK
echo "RESULT test: $r2 ($(grep -Eo 'Tests: succeeded [0-9]+, failed [0-9]+' "$OUT/test.log" | tail -1))"
[ "$r2" = OK ] || { tail -30 "$OUT/test.log"; exit 1; }

SPARK_GRAFT_CPUS=8 sbt -batch "runMain graft.Verify $SF $OUT/verify" \
  >"$OUT/verify.log" 2>&1 \
  && python3 tools/check.py "$OUT/verify" "$SF" >"$OUT/check.log" 2>&1 && r3=OK
echo "RESULT verify+oracle: $r3 ($(tail -1 "$OUT/check.log" 2>/dev/null))"
[ "$r3" = OK ] || { tail -30 "$OUT/verify.log"; tail -30 "$OUT/check.log"; exit 1; }
