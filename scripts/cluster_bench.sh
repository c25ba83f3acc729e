#!/bin/bash
# Wall-clock bench across real executor-JVM boundaries (VERDICT r15 #6):
# the top-N committed-series entries timed on local-cluster[2,2,2048]
# (2 forked executor JVMs) and on local[4] (same cores, one JVM), with
# steady-run ratios. Launched like cluster_full.sh: a plain JVM with
# sbt's exported test classpath — a local-cluster SparkContext inside
# the sbt JVM has no usable executor classpath.
#
# Usage: scripts/cluster_bench.sh [sfDir] [outJson] [topN]
set -euo pipefail
SF="${1:-/root/testdata/sf0.1}"
OUT="${2:-/root/repo/CLUSTER_BENCH.json}"
TOPN="${3:-20}"
cd /root/repo
sbt -batch compile 'export Test/fullClasspath' 2>/dev/null | tail -1 > /tmp/graft_cluster_cp.txt
CP="$(cat /tmp/graft_cluster_cp.txt)"
WORK="$(mktemp -d /tmp/graft_cluster_bench_XXXX)"
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
  graft.tools.ClusterBench "$SF" "$OUT" "$TOPN"
python3 - "$OUT" <<'EOF'
import json, sys
r = json.load(open(sys.argv[1]))
print("worst ratios:", json.dumps(r["worst_ratios"]))
EOF
