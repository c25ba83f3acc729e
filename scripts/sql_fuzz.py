#!/usr/bin/env python3
"""DuckDB side of the SQL fuzz harness (graft.tools.SqlFuzz): replays each
generated query from <out>/fuzz_sql.json against the same parquet tables and
value-compares with the Spark result parquet in <out>/<name>/.

Comparison is VALUE-based (not arrow-type-based, unlike check.py): the fuzz
deliberately crosses type-widening seams (DuckDB sum(bigint)->decimal128 vs
Spark bigint), so cells are normalized to python scalars — Decimal->float,
tz-aware timestamps->naive UTC — and floats compare with relative tolerance
1e-9 (aggregation association order differs between engines). If the ordered
row-by-row compare fails, a multiset fallback re-sorts both sides by a
rounded representation first — a near-tie in an ORDER BY double can swap two
adjacent rows without either engine being wrong.

Dev tool only — not part of the shipped library.

Usage: sql_fuzz.py <sfDir> <outDir> [reportPath]
"""
import json, math, sys
from decimal import Decimal
import datetime as dt
import duckdb
import pyarrow.dataset as ds

sfdir, outdir = sys.argv[1], sys.argv[2]
report_path = sys.argv[3] if len(sys.argv) > 3 else None

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")

def norm(v):
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, dt.datetime):
        if v.tzinfo is not None:
            return v.astimezone(dt.timezone.utc).replace(tzinfo=None)
        return v
    if isinstance(v, bool):
        return int(v)
    return v

def cell_eq(a, b):
    a, b = norm(a), norm(b)
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) or isinstance(b, float):
        fa, fb = float(a), float(b)
        if math.isnan(fa) and math.isnan(fb):
            return True
        return fa == fb or abs(fa - fb) <= 1e-9 * max(1.0, abs(fa), abs(fb))
    return a == b

def rows_of(pydict, cols):
    n = len(pydict[cols[0]]) if cols else 0
    return [tuple(norm(pydict[c][i]) for c in cols) for i in range(n)]

def sort_key(row):
    out = []
    for v in row:
        if v is None:
            out.append((0, ""))
        elif isinstance(v, (int, float)) and not isinstance(v, bool):
            # ONE key format for every numeric: the two engines can return
            # the same column as int vs float (Decimal->float via norm),
            # and str(int) sorts lexicographically while floats sort by
            # exponent form — mixed formats would misalign the multiset
            out.append((1, f"{float(v):.17e}"))
        else:
            out.append((1, str(v)))
    return out

def compare(got, exp, cols):
    g, e = rows_of(got, cols), rows_of(exp, cols)
    if len(g) != len(e):
        return f"rows {len(g)} vs {len(e)}", None
    def pairwise(ga, ea):
        for i, (ra, rb) in enumerate(zip(ga, ea)):
            for j, (a, b) in enumerate(zip(ra, rb)):
                if not cell_eq(a, b):
                    return (cols[j], i, a, b)
        return None
    bad = pairwise(g, e)
    if bad is None:
        return None, "ordered"
    # multiset fallback: re-sort both sides by a rounded representation
    gs, es = sorted(g, key=sort_key), sorted(e, key=sort_key)
    bad2 = pairwise(gs, es)
    if bad2 is None:
        return None, "multiset"
    c, i, a, b = bad2
    return f"col {c} row {i}: spark={a!r} duckdb={b!r}", None

manifest = json.load(open(f"{outdir}/fuzz_sql.json"))
fails, multiset_used, results = 0, 0, []
for name, sql in sorted(manifest.items()):
    try:
        tbl = ds.dataset(f"{outdir}/{name}").to_table()
        got = tbl.to_pydict()
    except Exception as e:
        print(f"FAIL {name}: no spark output ({e})"); fails += 1
        results.append({"name": name, "status": "no_spark_output"}); continue
    try:
        exp = con.execute(sql).fetch_arrow_table().to_pydict()
    except Exception as e:
        print(f"FAIL {name}: duckdb error: {e}\n  {sql}"); fails += 1
        results.append({"name": name, "status": "duckdb_error", "err": str(e)[:300]}); continue
    gcols, ecols = sorted(got.keys()), sorted(exp.keys())
    if gcols != ecols:
        print(f"FAIL {name}: columns {gcols} vs {ecols}"); fails += 1
        results.append({"name": name, "status": "columns"}); continue
    err, mode = compare(got, exp, gcols)
    nrows = len(got[gcols[0]]) if gcols else 0
    if err:
        print(f"FAIL {name}: {err}\n  {sql}"); fails += 1
        results.append({"name": name, "status": "mismatch", "detail": err, "sql": sql})
    else:
        if mode == "multiset":
            multiset_used += 1
        results.append({"name": name, "status": "pass", "rows": nrows, "mode": mode})

n = len(manifest)
print(f"\n{'ALL PASS' if fails == 0 else f'{fails} FAILURES'} / {n} queries "
      f"({multiset_used} needed the multiset fallback)")
if report_path:
    summary = {
        "tool": "graft.tools.SqlFuzz + scripts/sql_fuzz.py",
        "sf_dir": sfdir,
        "n_queries": n,
        "passed": n - fails,
        "failed": fails,
        "multiset_fallback_used": multiset_used,
        "failures": [r for r in results if r["status"] != "pass"],
    }
    with open(report_path, "w") as f:
        json.dump(summary, f, indent=1)
    print(f"report -> {report_path}")
sys.exit(1 if fails else 0)
