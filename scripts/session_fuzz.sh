#!/bin/bash
# Out-of-order SESSION-window fuzz sweep (VERDICT r17 #1, extended r19
# per VERDICT r18 #3): four legs — two scales against the correct model,
# a ROCKSDB-provider leg (the session-window state-save path was the one
# streaming family the per-round provider sweep didn't cover), plus the
# MUTATION leg (no-lag model) that must come back all-red or the corpus
# isn't exercising the two-watermark split. Assembles
# SESSIONFUZZ_r{N}.json and FAILS (exit 3) when the mutation invariant
# doesn't hold (ADVICE r18 — the old script recorded
# all_red_as_required:false and still exited 0).
#
# Usage: scripts/session_fuzz.sh [outJson] [n_small] [n_mid] [n_mut] [n_rocks]
set -euo pipefail
OUT="${1:-/root/repo/SESSIONFUZZ_r19.json}"
N1="${2:-120}"
N2="${3:-60}"
NM="${4:-20}"
NR="${5:-60}"
cd /root/repo
sbt -batch compile 'export Runtime/fullClasspath' 2>/dev/null | tail -1 > /tmp/graft_sess_cp.txt
CP="$(cat /tmp/graft_sess_cp.txt)"
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens=java.base/$p=ALL-UNNAMED"
done
RUN="java $ADD_OPENS -Xmx8g -Duser.timezone=UTC -cp $CP graft.tools.SessionFuzz"
$RUN /root/testdata/sf0.001 /tmp/sessfuzz_sf0001.json "$N1" 61000
$RUN /root/testdata/sf0.01  /tmp/sessfuzz_sf001.json  "$N2" 62000
# rocksdb leg: same correct model, same shape generator, fresh seeds,
# RocksDB provider forced — exercises SessionWindowStateStoreSaveExec on
# the scale-path provider
$RUN /root/testdata/sf0.001 /tmp/sessfuzz_rocksdb.json "$NR" 63000 rocksdb
# mutation leg EXPECTS exit 2 (all shapes must fail under the wrong model)
set +e
$RUN /root/testdata/sf0.001 /tmp/sessfuzz_nolag.json "$NM" 61000 nolag
MUT_RC=$?
set -e
python3 - "$OUT" "$MUT_RC" <<'EOF'
import json, sys
out, mut_rc = sys.argv[1], int(sys.argv[2])
a = json.load(open('/tmp/sessfuzz_sf0001.json'))
b = json.load(open('/tmp/sessfuzz_sf001.json'))
r = json.load(open('/tmp/sessfuzz_rocksdb.json'))
m = json.load(open('/tmp/sessfuzz_nolag.json'))
doc = {
 "tool": "graft.tools.SessionFuzz (scripts/session_fuzz.sh)",
 "what": ("out-of-order SESSION windows vs a single-threaded Scala model of "
          "Spark's streaming session semantics: merge-on-touch, the one-batch "
          "late-filter lag (two-watermark split), append-mode evict-after-merge, "
          "and double-emission when a late row re-opens an evicted session "
          "(the case a batch SQL oracle cannot express). Exact multiset "
          "compare over (key, session_start, session_end, integer aggs), "
          "session bounds taken from the ENGINE's session_window struct."),
 "legs": {"sf0.001": a, "sf0.01": b, "rocksdb": r},
 "n_total": a["n"] + b["n"] + r["n"],
 "n_failed": a["n_failed"] + b["n_failed"] + r["n_failed"],
 "coverage": {
   "shapes_with_late_drops": a["shapes_with_late_drops"] + b["shapes_with_late_drops"] + r["shapes_with_late_drops"],
   "shapes_with_mid_evictions": a["shapes_with_mid_evictions"] + b["shapes_with_mid_evictions"] + r["shapes_with_mid_evictions"],
   "shapes_with_double_emission": a["shapes_with_double_emission"] + b["shapes_with_double_emission"] + r["shapes_with_double_emission"],
   "total_late_dropped": a["total_late_dropped"] + b["total_late_dropped"] + r["total_late_dropped"],
   "total_model_sessions": a["total_model_sessions"] + b["total_model_sessions"] + r["total_model_sessions"]},
 "rocksdb_leg": {
   "what": ("same correct-model oracle with the RocksDB state-store provider "
            "forced (VERDICT r18 #3): covers SessionWindowStateStoreSaveExec "
            "on the scale-path provider, which the per-round ROCKSDB_SWEEP "
            "families never touched"),
   "n": r["n"], "n_failed": r["n_failed"], "provider": r.get("provider")},
 "mutation_leg": {
   "what": ("same corpus against the no-lag model (late filter = eviction "
            "watermark): every LAG-SENSITIVE shape (where the two models "
            "disagree on the schedule) must FAIL, or the corpus is not "
            "exercising the lag; lag-insensitive shapes are classified out "
            "by the tool, not counted green"),
   "n": m["n"], "n_failed": m["n_failed"],
   "lag_insensitive": m.get("lag_insensitive", 0),
   "all_red_as_required": (m["n_failed"] + m.get("lag_insensitive", 0) == m["n"]
                           and m["n_failed"] > 0 and mut_rc != 0)}}
json.dump(doc, open(out, 'w'), indent=1)
print(f"[session_fuzz] {doc['n_total']-doc['n_failed']}/{doc['n_total']} green, "
      f"rocksdb {r['n']-r['n_failed']}/{r['n']}, "
      f"mutation all-red={doc['mutation_leg']['all_red_as_required']} -> {out}")
# enforce, don't just record (ADVICE r18): a green mutation leg means the
# corpus stopped exercising the two-watermark lag — that is a regression
# the driver/CI must see as a nonzero exit, not a JSON field
if not doc["mutation_leg"]["all_red_as_required"]:
    sys.exit(3)
EOF
