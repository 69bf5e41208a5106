#!/bin/bash
# Run the list-extract phase at a given core count with GC logging, take
# thread dumps mid-run to spot contention.
set -euo pipefail
CPUS="${1:-32}"
SF="${2:-/root/testdata/sf0.1}"
REPO=/root/repo
CLASSES="$REPO/target/scala-2.13/classes"
JARS=$(ls /opt/spark/jars/*.jar | tr '\n' ':')
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_CPUS="$CPUS" \
  java -Xmx24g -Xlog:gc:/tmp/gc_$CPUS.log $ADD_OPENS -Dspark.ui.enabled=false \
  -cp "$CLASSES:$JARS" graft.Bench > /tmp/bench_$CPUS.json 2>/dev/null &
PID=$!
sleep 25
jstack $PID > /tmp/jstack_${CPUS}_1.txt 2>/dev/null || true
sleep 15
jstack $PID > /tmp/jstack_${CPUS}_2.txt 2>/dev/null || true
wait $PID
echo "done; gc log /tmp/gc_$CPUS.log, dumps /tmp/jstack_${CPUS}_*.txt"
tail -1 /tmp/bench_$CPUS.json
