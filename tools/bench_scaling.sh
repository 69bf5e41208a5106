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

# Same heap default as build.sbt's forked JVM (SPARK_DRIVER_MEM, 8g) so the
# two bench paths are comparable; the JSON stamps heap_mb either way.
run_bench() {
  local cpus=$1
  SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_CPUS="$cpus" \
    SPARK_GRAFT_REPEATS="${REPEATS:-2}" \
    java -Xmx"${SPARK_DRIVER_MEM:-8g}" $ADD_OPENS -Dspark.ui.enabled=false \
    -cp "$CLASSES:$JARS" graft.Bench 2>/dev/null | tail -1
}

N_LOW="${N_LOW:-8}"
N_HIGH="${N_HIGH:-32}"
mkdir -p "$REPO/work"
echo "== local[$N_LOW] =="
J8=$(run_bench "$N_LOW")
echo "$J8"
echo "== local[$N_HIGH] =="
J32=$(run_bench "$N_HIGH")
echo "$J32"

python3 - "$J8" "$J32" "$N_LOW" "$N_HIGH" <<'EOF'
import json, sys
j8, j32 = json.loads(sys.argv[1]), json.loads(sys.argv[2])
lo, hi = int(sys.argv[3]), int(sys.argv[4])
ratio = hi / lo
t8, t32 = j8["value"], j32["value"]
b8, b32 = j8["bfs_urls_per_sec"], j32["bfs_urls_per_sec"]
eff = t32 / (ratio * t8)
beff = b32 / (ratio * b8)
print(f"list extract: {t8:.1f} urls/s @{lo} -> {t32:.1f} urls/s @{hi}, efficiency {eff:.3f}")
print(f"bfs crawl:    {b8:.1f} urls/s @{lo} -> {b32:.1f} urls/s @{hi}, efficiency {beff:.3f}")
out = {"sf": j8["sf"], f"cores{lo}": j8, f"cores{hi}": j32,
       "scaling_efficiency_list": round(eff, 3),
       "scaling_efficiency_bfs": round(beff, 3)}
open(f"/root/repo/work/scaling_{lo}_{hi}.json", "w").write(json.dumps(out, indent=2))
print(f"written /root/repo/work/scaling_{lo}_{hi}.json")
EOF
