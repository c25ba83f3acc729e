#!/usr/bin/env python3
"""Assemble the streaming-fuzz record (VERDICT r15 "next round" #4) from
the per-leg reports scripts/sql_fuzz.py writes: each leg is a seeded
graft.tools.StreamFuzz sweep (random watermarked tumbling/sliding/session
aggregations + stream-stream interval joins executed as real Structured
Streaming queries) value-compared against DuckDB batch oracles.

Usage: stream_fuzz_assemble.py <out.json> <legReport1> [legReport2 ...]
Dev tool only — not part of the shipped library.
"""
import json, sys

out = sys.argv[1]
legs = [json.load(open(p)) for p in sys.argv[2:]]

doc = {
    "tool": "graft.tools.StreamFuzz + scripts/sql_fuzz.py",
    "what": ("seeded random STREAMING shapes — watermarked tumbling/"
             "sliding/session window aggregations (random widths, slides, "
             "gaps, keys, aggregate sets, predicates, watermark delays, "
             "staged vs single-batch arrival) and stream-stream interval "
             "joins (inner + left outer, random event-type sides and time "
             "bounds) — executed as real Structured Streaming queries with "
             "the catalog's two-round FLUSH sentinel protocol, "
             "value-compared against DuckDB batch SQL oracles over the "
             "same parquet"),
    "replay": "runMain graft.tools.StreamFuzz <sfDir> <out> <n> <seedBase>; a failure replays from its printed (seedBase, i)",
    "n_queries": sum(l["n_queries"] for l in legs),
    "passed": sum(l["passed"] for l in legs),
    "failed": sum(l["failed"] for l in legs),
    "legs": [{k: l[k] for k in
              ("sf_dir", "n_queries", "passed", "failed",
               "multiset_fallback_used", "failures")} for l in legs],
}
json.dump(doc, open(out, "w"), indent=1)
print(f"-> {out} ({doc['passed']}/{doc['n_queries']} passed)")
