#!/bin/bash
# Quiet-box FULL bench attempt (BENCH.md protocol): wait for 1-min loadavg
# <= 0.2 (up to 15 min), snapshot classes, run graft.Bench with plain java,
# sample /proc/stat steal alongside. Usage: tools/bench_full.sh <out.json>
set -euo pipefail
cd "$(dirname "$0")/.."
OUT="${1:?usage: bench_full.sh <out.json>}"
for i in $(seq 1 90); do
  L=$(cut -d' ' -f1 /proc/loadavg)
  awk -v l="$L" 'BEGIN{exit !(l <= 0.2)}' && break
  sleep 10
done
echo "launch loadavg: $(cut -d' ' -f1-3 /proc/loadavg)" >&2
SNAP=$(mktemp -d /tmp/graft_full_classes_XXXXXX)
cp -a target/scala-2.13/classes/. "$SNAP/"
STEAL_LOG="${OUT%.json}.steal"
(
  while true; do
    awk '/^cpu /{print systime(), $2+$3+$4+$5+$6+$7+$8+$9, $9}' /proc/stat
    sleep 5
  done
) > "$STEAL_LOG" 2>/dev/null &
STEAL_PID=$!
trap 'kill $STEAL_PID 2>/dev/null; rm -rf "$SNAP"' EXIT
OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
SPARK_GRAFT_BENCH_OUT="$OUT" java $OPENS -Xmx"${SPARK_DRIVER_MEM:-16g}" \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "$SNAP:/opt/spark/jars/*" graft.Bench 2>/dev/null | grep -F '"metric"' || true
