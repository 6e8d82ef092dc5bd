#!/bin/bash
# One quiet-box bench attempt per BENCH.md: record launch load, sample
# /proc/stat steal% at 5 s intervals for the duration, run graft.Bench via
# plain java (no sbt lock/overhead), save the JSON line. Usage:
#   tools/bench_attempt.sh <tag>     # writes /tmp/bench_<tag>.json + .steal
set -euo pipefail
cd "$(dirname "$0")/.."
TAG="${1:?usage: bench_attempt.sh <tag>}"
if [ ! -d target/scala-2.13/classes ]; then
  echo "error: run 'sbt compile' first" >&2; exit 1
fi
echo "launch loadavg: $(cut -d' ' -f1-3 /proc/loadavg)"
# classes snapshot (same rationale as corpus_run.sh: a concurrent compile
# renumbers anonfun classes under a lazily-loading JVM)
SNAP=$(mktemp -d /tmp/graft_bench_classes_XXXXXX)
cp -a target/scala-2.13/classes/. "$SNAP/"
STEAL="/tmp/bench_${TAG}.steal"
: > "$STEAL"
(
  prev_total=0; prev_steal=0
  while :; do
    read -r _ u n s i io irq sirq st _ < /proc/stat
    total=$((u + n + s + i + io + irq + sirq + st))
    if [ "$prev_total" -ne 0 ] && [ $((total - prev_total)) -gt 0 ]; then
      awk -v ds=$((st - prev_steal)) -v dt=$((total - prev_total)) \
        'BEGIN{printf "%.2f\n", 100 * ds / dt}' >> "$STEAL"
    fi
    prev_total=$total; prev_steal=$st
    sleep 5
  done
) &
SAMPLER=$!
trap 'kill $SAMPLER 2>/dev/null; rm -rf "$SNAP"' EXIT
OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
java $OPENS -Xmx"${SPARK_DRIVER_MEM:-16g}" \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "$SNAP:/opt/spark/jars/*" graft.Bench 2>/dev/null \
  | grep -F '"metric"' | tee "/tmp/bench_${TAG}.json"
# pipefail catches a crashed Bench upstream of tee; an empty capture file
# (grep matched nothing) must also fail, not pose as an attempt result
if [ ! -s "/tmp/bench_${TAG}.json" ]; then
  echo "error: bench produced no JSON line (crash or changed output format)" >&2
  exit 1
fi
echo "steal samples (max / p95): $(sort -n "$STEAL" | tail -1) / $(sort -n "$STEAL" | awk '{a[NR]=$1} END{print a[int(NR*0.95)]}')"
