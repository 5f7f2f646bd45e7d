#!/bin/bash
# Segmented sf10 gate: one fresh 16g JVM per query family (prefix),
# single pass, SPARK_GRAFT_BENCH_OUT per segment. One family's
# allocation failure cannot discard the rest (VARIANCE_r12 §4); every
# family including graph and profile is covered (ADVICE r12 item 2).
#   tools/seg_gate.sh <sfDir> <outPrefix e.g. bench/BENCH_r13_sf10_seg>
set -u
cd "$(dirname "$0")/.."
SFDIR=${1:?sfDir}; OUTP=${2:?outPrefix}
OPENS="--add-opens=java.base/java.lang=ALL-UNNAMED --add-opens=java.base/java.lang.invoke=ALL-UNNAMED --add-opens=java.base/java.lang.reflect=ALL-UNNAMED --add-opens=java.base/java.io=ALL-UNNAMED --add-opens=java.base/java.net=ALL-UNNAMED --add-opens=java.base/java.nio=ALL-UNNAMED --add-opens=java.base/java.util=ALL-UNNAMED --add-opens=java.base/java.util.concurrent=ALL-UNNAMED --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens=java.base/sun.nio.ch=ALL-UNNAMED --add-opens=java.base/sun.nio.cs=ALL-UNNAMED --add-opens=java.base/sun.security.action=ALL-UNNAMED --add-opens=java.base/sun.util.calendar=ALL-UNNAMED"
RCALL=0
for FAM in ann dedup embed etl graph mm pipeline profile text q; do
  if [ "$FAM" = q ]; then PAT='^q'; else PAT="^${FAM}_"; fi
  KEYS=$(python3 - "$PAT" <<'PY'
import json, re, sys
d = json.load(open('bench/latest_sf0.1.json'))
pat = re.compile(sys.argv[1])
print(",".join(sorted(k for k in d['queries'] if pat.match(k))))
PY
)
  echo "[seg_gate] $FAM ($(echo "$KEYS" | tr ',' '\n' | wc -l) queries)"
  SPARK_GRAFT_SF_DIR=$SFDIR SPARK_GRAFT_BENCH_CHILD=1 SPARK_GRAFT_BENCH_PASSES=1 \
  SPARK_GRAFT_BENCH_ONLY="$KEYS" SPARK_GRAFT_BENCH_OUT=${OUTP}_${FAM}.json \
  java -Xmx16g $OPENS -cp "/opt/spark/jars/*:target/scala-2.13/classes:src/main/resources" \
    graft.Bench > /tmp/seg_gate_${FAM}.stdout 2>/tmp/seg_gate_${FAM}.log
  RC=$?
  echo "[seg_gate] $FAM rc=$RC"
  [ $RC -ne 0 ] && RCALL=$RC
done
exit $RCALL
