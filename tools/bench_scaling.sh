#!/bin/bash
# Scaling-efficiency evidence for the north rule (>= 0.8 from N to 4N):
# run graft.Bench on the SAME input at local[8] and local[32] and report
# throughput at both plus efficiency = thr32 / (4 * thr8).
# Usage: tools/bench_scaling.sh [sfDir] — default /root/testdata/sf0.1
set -euo pipefail
SF="${1:-/root/testdata/sf0.1}"
REPO=/root/repo
CLASSES="$REPO/target/scala-2.13/classes"
JARS=$(ls /opt/spark/jars/*.jar | tr '\n' ':')
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done

run_bench() {
  local cpus=$1
  SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_CPUS="$cpus" \
    java -Xmx24g $ADD_OPENS -Dspark.ui.enabled=false \
    -cp "$CLASSES:$JARS" graft.Bench 2>/dev/null | tail -1
}

mkdir -p "$REPO/work"
echo "== local[8] =="
J8=$(run_bench 8)
echo "$J8"
echo "== local[32] =="
J32=$(run_bench 32)
echo "$J32"

python3 - "$J8" "$J32" <<'EOF'
import json, sys
j8, j32 = json.loads(sys.argv[1]), json.loads(sys.argv[2])
t8, t32 = j8["value"], j32["value"]
b8, b32 = j8["bfs_urls_per_sec"], j32["bfs_urls_per_sec"]
eff = t32 / (4 * t8)
beff = b32 / (4 * b8)
print(f"list extract: {t8:.1f} urls/s @8 -> {t32:.1f} urls/s @32, efficiency {eff:.3f}")
print(f"bfs crawl:    {b8:.1f} urls/s @8 -> {b32:.1f} urls/s @32, efficiency {beff:.3f}")
out = {"sf": j8["sf"], "cores8": j8, "cores32": j32,
       "scaling_efficiency_list": round(eff, 3),
       "scaling_efficiency_bfs": round(beff, 3)}
open("/root/repo/work/scaling.json", "w").write(json.dumps(out, indent=2))
print("written /root/repo/work/scaling.json")
EOF
