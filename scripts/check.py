#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: reads Verify output
(<out>/<name>/ parquet + oracle_sql.json), runs each oracle in DuckDB over
the same sf dir, and compares values column-by-column (columns sorted by
name). Dev tool only — not part of the shipped library."""
import json, math, sys
import duckdb
import pyarrow.parquet as pq
import pyarrow.dataset as ds

sfdir, outdir = sys.argv[1], sys.argv[2]
only = set(sys.argv[3].split(',')) if len(sys.argv) > 3 else None

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fails = 0
for name, sql in sorted(oracle.items()):
    if only and name not in only: continue
    try:
        got = ds.dataset(f"{outdir}/{name}").to_table().to_pydict()
    except Exception as e:
        print(f"FAIL {name}: no spark output ({e})"); fails += 1; continue
    try:
        exp_tbl = con.execute(sql).fetch_arrow_table()
    except Exception as e:
        print(f"FAIL {name}: oracle error: {e}"); fails += 1; continue
    exp = exp_tbl.to_pydict()
    gcols, ecols = sorted(got.keys()), sorted(exp.keys())
    if gcols != ecols:
        print(f"FAIL {name}: columns {gcols} vs {ecols}"); fails += 1; continue
    # the driver's hash compare serializes VALUES WITH TYPES: a DuckDB
    # decimal128 sum() vs a Spark int64 hash-mismatches even when every
    # value is equal (the r5 q_profile/q_sessionize red rows) — so flag
    # arrow-type divergence here even though the value loop below wouldn't
    gtypes = {f.name: str(f.type) for f in ds.dataset(f"{outdir}/{name}").schema}
    etypes = {f.name: str(f.type) for f in exp_tbl.schema}
    tdiff = {c: (gtypes[c], etypes[c]) for c in gtypes if gtypes[c] != etypes.get(c)}
    if tdiff:
        print(f"FAIL {name}: type divergence {tdiff}"); fails += 1; continue
    nrow_g = len(got[gcols[0]]) if gcols else 0
    nrow_e = len(exp[ecols[0]]) if ecols else 0
    if nrow_g != nrow_e:
        print(f"FAIL {name}: rows {nrow_g} vs {nrow_e}"); fails += 1; continue
    bad = None
    for c in gcols:
        for i, (a, b) in enumerate(zip(got[c], exp[c])):
            if a is None and b is None: continue
            if isinstance(a, float) and isinstance(b, float):
                if a == b or (math.isnan(a) and math.isnan(b)): continue
                bad = (c, i, a, b); break
            if a != b:
                bad = (c, i, a, b); break
        if bad: break
    if bad:
        c, i, a, b = bad
        print(f"FAIL {name}: col {c} row {i}: spark={a!r} oracle={b!r}"); fails += 1
    else:
        print(f"PASS {name} ({nrow_g} rows)")
print(f"\n{'ALL PASS' if fails == 0 else f'{fails} FAILURES'} / {len([n for n in oracle if not only or n in only])} queries")
sys.exit(1 if fails else 0)
