#!/usr/bin/env python3
"""Assemble BENCH_spill_r15.json from the memory-pressure ladder legs
(VERDICT r14 stretch #9): the sf1 descending-heap ladder (window+minhash,
no pressure), the sf10 window ladder (eviction-bounded state — no death
possible), the sf10 minhash ladder (corpus-growing state — the death
point, with the RocksDB contrast at the death heap), and the batch
SpillProbe curve (external-sort spill degradation + its OOM fence).
Reads the /tmp leg files written by scripts/spill_probe.sh,
/tmp/spill_sf10*.sh and the SpillProbe rungs. Dev tool only.

Usage: spill_assemble.py <out.json>
"""
import json, sys, os

out_path = sys.argv[1]

def leg(path):
    if not os.path.exists(path):
        return None
    d = json.load(open(path))
    r = {"wall_sec": d["wall_sec"], "memory": d["memory"]}
    for k in ("flatness_ratio", "median_ms", "state_rows_final", "triggers_ran"):
        if k in d:
            r[k] = d[k]
    if "latency_ms" in d:
        r["latency_p50_ms"] = d["latency_ms"].get("p50")
    return r

# verified death causes, read from each rung's own log by hand before
# assembling — a missing report file alone does not say WHY a rung has no
# report (never ran vs timeout-killed vs OOM), so nothing is fabricated
# for unknown heaps: they are recorded as exactly that
VERIFIED_DEATHS = {
    "batch:640m": ("SparkOutOfMemoryError UNABLE_TO_ACQUIRE_MEMORY after 29 s "
                   "(verified in the rung log: execution pool exhausted below "
                   "one sorter page)"),
}

def ladder(tmpl, heaps, family=""):
    steps = {}
    for h in heaps:
        l = leg(tmpl.format(h=h))
        if l:
            # a leg JSON existing for a heap we previously hand-verified as
            # a death means the ladder was re-run and the rung now SURVIVES
            # — re-emitting the stale death claim would fabricate a record
            if f"{family}:{h}" in VERIFIED_DEATHS:
                sys.exit(f"STALE DEATH CLAIM: {family}:{h} has a VERIFIED_DEATHS "
                         f"entry but a leg report now exists at {tmpl.format(h=h)} "
                         f"— re-verify the rung log and update VERIFIED_DEATHS")
            steps[h] = l
        else:
            steps[h] = {"outcome": VERIFIED_DEATHS.get(
                f"{family}:{h}",
                "no report written (did not run, timeout, or died — see rung log)")}
            break
    return steps

def batch_leg(h):
    p = f"/tmp/batchspill_{h}.json"
    if not os.path.exists(p):
        return {"outcome": VERIFIED_DEATHS.get(
            f"batch:{h}",
            "no report written (did not run, timeout, or died — see rung log)")}
    if f"batch:{h}" in VERIFIED_DEATHS:
        sys.exit(f"STALE DEATH CLAIM: batch:{h} has a VERIFIED_DEATHS entry but "
                 f"a leg report now exists at {p} — re-verify the rung log and "
                 f"update VERIFIED_DEATHS")
    d = json.load(open(p))
    return {"wall_sec": d["wall_sec"], "rows": d["rows"],
            "groups": d["groups"], "memory": d["memory"]}

doc = {
    "tool": "scripts/spill_probe.sh + graft.tools.SteadyStream(memory) + graft.tools.SpillProbe",
    "what": ("memory-pressure ladders: descending driver-JVM heap (-Xmx = "
             "the whole local-mode executor) until the run dies, spill "
             "volume from Spark task metrics in every report"),
    "streaming_sf1": {
        "note": ("10x corpus, 20 triggers, no pressure anywhere down to "
                 "640m: window state is watermark-evicted, minhash state "
                 "off-heap under RocksDB"),
        "window_hdfs": ladder("/tmp/spill_window_{h}.json", ["8g", "4g", "2g", "1g", "640m"]),
        "minhash_rocksdb": ladder("/tmp/spill_minhash_{h}.json", ["8g", "4g", "2g", "1g", "640m"]),
    },
    "streaming_sf10_window_hdfs": {
        "note": ("100x corpus, heap-resident HDFS provider, and STILL no "
                 "death at 640m: the engine's state is eviction-bounded by "
                 "the watermark (state_rows_final identical at every heap), "
                 "so heap demand is O(live window), not O(corpus) — the "
                 "design claim, now measured"),
        "ladder": ladder("/tmp/spill10_window_hdfs_{h}.json", ["8g", "4g", "2g", "1g", "640m"]),
    },
    "streaming_sf10_minhash": {
        "note": ("100x corpus, bucket state GROWS with corpus (~7.6M rows) "
                 "— the workload where provider choice decides survival. "
                 "Heap-resident HDFS provider: java.lang.OutOfMemoryError "
                 "at 4g (206 s in) AND at 8g (570 s in — more heap only "
                 "delays the same death; the one-trigger sf10 replay needed "
                 "48g). RocksDB (off-heap state): completes all 20 triggers "
                 "in a 4g JVM and again in a 2g JVM at the same flat wall — "
                 "the provider crossover, measured at the death point"),
        "hdfs_4g": {"outcome": "java.lang.OutOfMemoryError: Java heap space after 206 s (verified in rung log)"},
        "hdfs_8g": {"outcome": "java.lang.OutOfMemoryError: Java heap space after 570 s (verified in rung log)"},
        "rocksdb_4g": leg("/tmp/spill10_minhash_rocksdb_4g.json"),
        "rocksdb_2g": leg("/tmp/spill10_minhash_rocksdb_2g.json"),
    },
    "batch_sort_aggregate_sf10": {
        "note": ("60M-row wide sort + high-cardinality collect_set "
                 "aggregate (graft.tools.SpillProbe): external sort spills "
                 "and COMPLETES at flat wall from 8g down to 1g; the fence "
                 "below is Spark's memory manager failing loudly, not a "
                 "hang"),
        "ladder": {h: batch_leg(h) for h in ["8g", "2g", "1g", "640m"]},
    },
}

# death notes from the ladder logs
for log, key in [("/tmp/spill_sf10b_ladder.log", "streaming_sf10_minhash")]:
    if os.path.exists(log):
        doc[key]["ladder_log"] = open(log).read().strip().splitlines()

json.dump(doc, open(out_path, "w"), indent=1)
print(f"-> {out_path}")
