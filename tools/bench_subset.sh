#!/bin/bash
# Quiet-box subset bench: wait for 1-min loadavg <= 0.35, then run
# graft.Bench on a comma-separated query list (plain java, classes snapshot).
# Usage: tools/bench_subset.sh q72_orders_wide,q76_incremental_merge
set -euo pipefail
cd "$(dirname "$0")/.."
ONLY="${1:?usage: bench_subset.sh <q1,q2,...>}"
for i in $(seq 1 60); do
  L=$(cut -d' ' -f1 /proc/loadavg)
  awk -v l="$L" 'BEGIN{exit !(l <= 0.35)}' && break
  sleep 10
done
echo "launch loadavg: $(cut -d' ' -f1-3 /proc/loadavg)" >&2
SNAP=$(mktemp -d /tmp/graft_subset_classes_XXXXXX)
cp -a target/scala-2.13/classes/. "$SNAP/"
trap 'rm -rf "$SNAP"' EXIT
OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
SPARK_GRAFT_BENCH_ONLY="$ONLY" java $OPENS -Xmx"${SPARK_DRIVER_MEM:-16g}" \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "$SNAP:/opt/spark/jars/*" graft.Bench 2>/dev/null | grep -F '"metric"'
