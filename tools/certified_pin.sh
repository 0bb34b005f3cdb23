#!/usr/bin/env bash
# Per-QUERY certified measurement (r13 protocol upgrade).
#
# The r13 retry runs measured the hole in chunk-level acceptance: the
# box's shuffle-burst mode oscillates on minute timescales, so a chunk
# whose two BOUNDARY calib legs read in-band can still contain rows
# that ran under a burst (observed: dedup_minhash_lsh 300.3 s inside
# an ACCEPTED chunk, 89.3 s isolated minutes later). This runner uses
# Bench's SPARK_GRAFT_BENCH_CALIB_EACH knob: one single-rep shuffle
# probe after EVERY query, and a row is CERTIFIED iff both its
# adjacent legs (the probe before it and the probe after it) read
# within the gate. Uncertified rows are upper bounds, re-run them.
#
#   tools/certified_pin.sh <tag> <sf_dir> <subset_csv> [runs]
#
# Artifacts land under measurements/ (TRACKED — target/ is wiped
# between sessions and every raw r12/r13 decade JSON died with it;
# from now on raw measurement artifacts are committed).
set -uo pipefail
cd /root/repo
# runs defaults to 2: a runs=1 reading of a JIT-heavy plan times the
# one-time codegen warm-up (20-120 s) rather than the plan (~6 s
# steady state, r14 mm adjudication) — Bench refuses to certify
# runs=1 rows, so a runs=1 invocation is an upper-bound probe only
# subset must be PASSED but may be empty — an empty subset runs the
# full suite (tools/measure.sh full)
TAG="${1:?tag}"; SFDIR="${2:?sf_dir}"; SUBSET="${3?subset}"; RUNS="${4:-2}"
OUT=measurements
mkdir -p "$OUT"
# refresh the frozen classpath whenever the compiled classes are newer
# (a stale benchcp after a recompile silently measures old code)
if [ ! -d target/benchcp ] || [ -n "$(find target/scala-2.13/classes -newer target/benchcp -print -quit 2>/dev/null)" ]; then
  rm -rf target/benchcp && cp -r target/scala-2.13/classes target/benchcp
fi
CP="target/benchcp:/opt/spark/jars/*"
CPUS="${SPARK_GRAFT_CPUS:-32}"
GATE="${SPARK_GRAFT_SHUF_GATE:-1.10}"

echo "=== certified_pin $TAG ($SFDIR, cpus=$CPUS, runs=$RUNS, gate=$GATE) $(date +%T) ==="
# a stale same-tag JSON from a previous run must never be adjudicated
# as a fresh result if this JVM crashes before writing its output
rm -f "$OUT/${TAG}.json"
SPARK_GRAFT_SF_DIR="$SFDIR" SPARK_GRAFT_CPUS="$CPUS" \
SPARK_GRAFT_BENCH_SUBSET="$SUBSET" SPARK_GRAFT_BENCH_RUNS="$RUNS" \
SPARK_GRAFT_BENCH_CALIB_EACH=1 \
SPARK_GRAFT_BENCH_FULL="$OUT/${TAG}.json" \
  java -Xmx96g --add-exports=java.base/sun.nio.ch=ALL-UNNAMED \
    -cp "$CP" graft.Bench 2>"$OUT/${TAG}.err" | tail -1 >/dev/null
RC=$?
if [ "$RC" -ne 0 ] || [ ! -s "$OUT/${TAG}.json" ]; then
  echo "ABORT: bench JVM rc=$RC, $OUT/${TAG}.json missing or empty (see $OUT/${TAG}.err)" >&2
  exit 1
fi

python3 - "$OUT/${TAG}.json" "$GATE" "$RUNS" <<'PY'
import json, sys
d = json.load(open(sys.argv[1])); gate = float(sys.argv[2])
# the artifact's own runs field is authoritative (ADVICE r15: trusting
# the shell arg prints wrong verdicts when adjudicating an artifact
# produced under a different/env-overridden runs); pre-r15 artifacts
# lack the field — only then fall back to the shell arg
runs = int(d.get("runs", sys.argv[3]))
legs = d["calib"].get("calib_each", {})
retried = d["calib"].get("retried", {})
vs_pin = d.get("vs_pin", {})
print(f"{'query':32s} {'sec':>9s} {'vs_pin':>7s} {'legs (around each rep)':>28s}  verdict")
for q, sec in sorted(d["queries"].items()):
    ls = legs.get(q, [])
    # sec > 0: a -1.0 failure sentinel must never certify (ADVICE r13);
    # runs >= 2: a runs=1 reading of a JIT-heavy plan times warm-up,
    # not the plan (r14 mm adjudication); ALL legs in gate: per-rep
    # legs since r15, so interior-rep bursts are visible (ADVICE r14)
    ok = sec > 0 and runs >= 2 and ls and all(l <= gate for l in ls)
    verdict = 'CERTIFIED' if ok else ('FAILED' if sec <= 0 else
        'runs=1 — upper bound' if runs < 2 else 'burst — upper bound')
    if retried.get(q):
        verdict += f" (after {retried[q]} retr{'y' if retried[q]==1 else 'ies'})"
    lstr = " ".join(f"{l:5.2f}" for l in ls)
    vp = f"{vs_pin[q]:7.2f}" if q in vs_pin else f"{'-':>7s}"
    print(f"{q:32s} {sec:9.2f} {vp} {lstr:>28s}  {verdict}")
PY
