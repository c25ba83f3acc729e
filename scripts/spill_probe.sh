#!/bin/bash
# Memory-pressure ladder (VERDICT r14 stretch #9): run the window and
# minhash steady workloads at 10x data under a descending driver-JVM heap
# and record the degradation curve — wall, flatness, spill volume from
# Spark's own task metrics (SteadyStream "memory" section) — down to the
# heap where the run dies. Every other committed steady measurement ran
# with generous heap; this is the honest other end of that axis.
#
# Usage: scripts/spill_probe.sh <sf1Dir> <outPrefix>
# Emits <outPrefix>_<workload>_<heap>.json per surviving rung and
# <outPrefix>_ladder.log with per-rung exit codes.
set -u
SF1=${1:?sf1 dir}
PREFIX=${2:?out prefix}
cd "$(dirname "$0")/.."
LOG="${PREFIX}_ladder.log"
: > "$LOG"
for wl in window minhash; do
  prov=hdfs
  [ "$wl" = minhash ] && prov=rocksdb
  for heap in 8g 4g 2g 1g 640m; do
    out="${PREFIX}_${wl}_${heap}.json"
    echo "=== $wl heap=$heap provider=$prov ===" | tee -a "$LOG"
    SPARK_DRIVER_MEM=$heap timeout 1800 sbt -batch \
      "runMain graft.tools.SteadyStream $SF1 $out $wl 20 $prov" \
      > "${PREFIX}_${wl}_${heap}.log" 2>&1
    rc=$?
    echo "$wl $heap rc=$rc" >> "$LOG"
    if [ $rc -ne 0 ]; then
      tail -5 "${PREFIX}_${wl}_${heap}.log" >> "$LOG"
      # a dead rung ends this workload's ladder — smaller heaps die too
      break
    fi
  done
done
echo LADDER_DONE | tee -a "$LOG"
