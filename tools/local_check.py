#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (dev tooling only).

Runs each oracle SQL in DuckDB against the sf parquet tables, loads the
Spark result parquet written by graft.Verify, sorts columns by name and
rows by value, and compares. Reports exact-match plus max float deviation
for near-misses so decimal-convention regressions are obvious.
"""
import json, math, sys, glob, os
import duckdb

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "target/verify_out"
ONLY = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                vals.append(("f", v))
            elif isinstance(v, list):
                vals.append(("l", tuple(map(str, v))))
            else:
                vals.append((type(v).__name__, str(v)))
        out.append(tuple(vals))
    return sorted(out, key=str), [cols[i] for i in order]

def float_close(a, b):
    if a == b: return 0.0
    if a is None or b is None: return math.inf
    try:
        if math.isnan(a) and math.isnan(b): return 0.0
        d = abs(a - b) / max(1e-12, abs(a), abs(b))
        return d
    except TypeError:
        return math.inf

results = {}
for name in sorted(os.listdir(OUT)):
    path = os.path.join(OUT, name)
    if not os.path.isdir(path):
        continue
    if ONLY and name not in ONLY:
        continue
    files = glob.glob(f"{path}/*.parquet")
    if not files:
        results[name] = "NO_SPARK_OUTPUT"
        continue
    sq = con.sql(f"SELECT * FROM '{path}/*.parquet'")
    scols, srows = sq.columns, sq.fetchall()
    if name not in oracle:
        results[name] = f"ROWS_ONLY({len(srows)})"
        continue
    try:
        oq = con.sql(oracle[name])
        ocols, orows = oq.columns, oq.fetchall()
    except Exception as e:
        results[name] = f"ORACLE_SQL_ERROR: {str(e).splitlines()[0][:120]}"
        continue
    if sorted(map(str.lower, scols)) != sorted(map(str.lower, ocols)):
        results[name] = f"SCHEMA_MISMATCH spark={sorted(scols)} oracle={sorted(ocols)}"
        continue
    if len(srows) != len(orows):
        results[name] = f"ROWCOUNT {len(srows)} vs {len(orows)}"
        continue
    a, _ = canon(srows, [c.lower() for c in scols])
    b, _ = canon(orows, [c.lower() for c in ocols])
    if a == b:
        results[name] = f"OK({len(srows)})"
        continue
    # not exact: measure worst float deviation pairing sorted rows
    worst = 0.0; ndiff = 0; example = None
    for ra, rb in zip(a, b):
        for va, vb in zip(ra, rb):
            if va == vb: continue
            if va[0] == "f" and vb[0] == "f":
                d = float_close(va[1], vb[1])
                if d > worst: worst = d; example = (va[1], vb[1])
                if d > 0: ndiff += 1
            else:
                ndiff += 1
                if example is None: example = (va, vb)
                worst = math.inf
    results[name] = f"VALUE_MISMATCH ndiff={ndiff} worst_rel={worst:.3e} ex={example}"

ok = sum(1 for v in results.values() if v.startswith("OK"))
ro = sum(1 for v in results.values() if v.startswith("ROWS_ONLY"))
bad = {k: v for k, v in results.items() if not (v.startswith("OK") or v.startswith("ROWS_ONLY"))}
for k in sorted(results):
    print(f"{k:28s} {results[k]}")
print(f"\n== {ok} OK, {ro} rows-only, {len(bad)} BAD of {len(results)}")
sys.exit(0 if not bad else 1)
