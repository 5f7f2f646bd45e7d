#!/bin/bash
# Segmented sf10 gate: one fresh 16g JVM per query family (prefix),
# single pass, SPARK_GRAFT_BENCH_OUT per segment. One family's
# allocation failure cannot discard the rest (VARIANCE_r12 §4).
#
# Families are DERIVED from bench/latest_sf0.1.json (ADVICE r13 item
# 4: the old hardcoded list silently excluded any later-added prefix,
# and an empty KEYS string made Bench run zero queries and exit 0).
# Invariants enforced here: the family partition covers every key
# exactly once, no family is empty, and each segment's log is scanned
# for silent interpreted-eval fallbacks (the r13 CodeRoute failure
# mode: janino rejects a generated fragment, Spark logs a warning and
# quietly runs ~10× slower — a perf gate must treat that as red).
#   tools/seg_gate.sh <sfDir> <outPrefix e.g. bench/BENCH_r14_sf10_seg>
set -u
cd "$(dirname "$0")/.."
SFDIR=${1:?sfDir}; OUTP=${2:?outPrefix}
OPENS="--add-opens=java.base/java.lang=ALL-UNNAMED --add-opens=java.base/java.lang.invoke=ALL-UNNAMED --add-opens=java.base/java.lang.reflect=ALL-UNNAMED --add-opens=java.base/java.io=ALL-UNNAMED --add-opens=java.base/java.net=ALL-UNNAMED --add-opens=java.base/java.nio=ALL-UNNAMED --add-opens=java.base/java.util=ALL-UNNAMED --add-opens=java.base/java.util.concurrent=ALL-UNNAMED --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens=java.base/sun.nio.ch=ALL-UNNAMED --add-opens=java.base/sun.nio.cs=ALL-UNNAMED --add-opens=java.base/sun.security.action=ALL-UNNAMED --add-opens=java.base/sun.util.calendar=ALL-UNNAMED"

# family = text up to the first '_' , except the relational q* block
# (q1_pricing_summary, q_abc_class, ...) which is one family "q"
FAMS=$(python3 - <<'PY'
import json
d = json.load(open('bench/latest_sf0.1.json'))
keys = sorted(d['queries'])
fams = {}
for k in keys:
    fam = 'q' if k.startswith('q') else k.split('_', 1)[0]
    fams.setdefault(fam, []).append(k)
covered = sum(len(v) for v in fams.values())
assert covered == len(keys), f"partition lost keys: {covered} != {len(keys)}"
assert all(fams.values()), "empty family"
for fam in sorted(fams):
    print(fam + ' ' + ','.join(fams[fam]))
PY
) || { echo "[seg_gate] family derivation failed"; exit 1; }
if [ -z "$FAMS" ]; then echo "[seg_gate] derived zero families"; exit 1; fi

RCALL=0
while read -r FAM KEYS; do
  if [ -z "$FAM" ] || [ -z "$KEYS" ]; then
    echo "[seg_gate] empty family/key list — refusing a zero-query segment"
    exit 1
  fi
  echo "[seg_gate] $FAM ($(echo "$KEYS" | tr ',' '\n' | wc -l) queries)"
  SPARK_GRAFT_SF_DIR=$SFDIR SPARK_GRAFT_BENCH_CHILD=1 SPARK_GRAFT_BENCH_PASSES=1 \
  SPARK_GRAFT_BENCH_ONLY="$KEYS" SPARK_GRAFT_BENCH_OUT=${OUTP}_${FAM}.json \
  java -Xmx16g $OPENS -cp "/opt/spark/jars/*:target/scala-2.13/classes:src/main/resources" \
    graft.Bench > /tmp/seg_gate_${FAM}.stdout 2>/tmp/seg_gate_${FAM}.log
  RC=$?
  echo "[seg_gate] $FAM rc=$RC"
  [ $RC -ne 0 ] && RCALL=$RC
  # a timed run that fell back to interpreted eval is not a valid
  # measurement of the codegen'd engine — fail the gate loudly
  if grep -qE "Expr codegen error|falling back to interpreter" /tmp/seg_gate_${FAM}.log; then
    echo "[seg_gate] $FAM: SILENT CODEGEN FALLBACK in log — segment invalid"
    grep -m 3 -E "Expr codegen error|falling back to interpreter" /tmp/seg_gate_${FAM}.log
    RCALL=1
  fi
done <<< "$FAMS"
exit $RCALL
