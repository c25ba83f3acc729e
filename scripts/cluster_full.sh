#!/bin/bash
# Full-catalog multi-JVM parity sweep: every SparkEntry entry on
# local-cluster[2,2,1024] (2 forked executor JVMs) diffed against a
# single-JVM local[4] oracle. The per-round sbt spec (LocalClusterSpec)
# runs the curated 16-entry probe; this script is the full 155-entry
# sweep whose report lands in CLUSTER_FULL.json.
#
# Usage: scripts/cluster_full.sh [sfDir] [outJson]
set -euo pipefail
SF="${1:-/root/testdata/sf0.001}"
OUT="${2:-/root/repo/CLUSTER_FULL.json}"
cd /root/repo
# the executors need the FULL dependency closure (a bare
# classes:spark-jars classpath makes every executor die at launch —
# observed as an unknown-executor churn loop); export sbt's test
# classpath, the same one the green LocalClusterSpec forks with
sbt -batch compile 'export Test/fullClasspath' 2>/dev/null | tail -1 > /tmp/graft_cluster_cp.txt
CP="$(cat /tmp/graft_cluster_cp.txt)"
WORK="$(mktemp -d /tmp/graft_cluster_full_XXXX)"
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens=java.base/$p=ALL-UNNAMED"
done
SPARK_HOME=/opt/spark SPARK_SCALA_VERSION=2.13 \
SPARK_WORKER_DIR="$WORK/work" SPARK_LOG_DIR="$WORK/logs" \
SPARK_LOCAL_IP=127.0.0.1 \
java $ADD_OPENS -Xmx6g -Duser.timezone=UTC -cp "$CP" \
  graft.tools.ClusterProbe "$SF" "$OUT" all
python3 - "$OUT" <<'EOF'
import json, sys
r = json.load(open(sys.argv[1]))
print("mode:", r["mode"], "entries:", r["n_entries"],
      "equal:", r["equal_count"], "all_equal:", r["all_equal"],
      "jvms:", r["distinct_executor_jvms"],
      "driver_ran_tasks:", r["driver_ran_tasks"])
bad = [k for k, v in r["entries"].items() if not v["equal"]]
if bad: print("UNEQUAL:", bad)
if r["failures"]: print("FAILURES:", [str(f) for f in r["failures"]])
EOF
