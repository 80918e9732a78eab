#!/usr/bin/env python3
"""Local pre-check mimicking the driver's correctness gate: for each
query parquet written by graft.Verify, run the matching oracle SQL in
DuckDB over the same testdata tables and compare values exactly
(rows sorted, columns sorted by name)."""
import json
import math
import sys

import duckdb

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT_DIR = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
# optional comma-separated query filter (matches graft.Verify's third arg)
ONLY = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

with open(f"{OUT_DIR}/oracle_sql.json") as f:
    oracle = json.load(f)

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(r[i] for i in order))
    return sorted(cols), sorted(out, key=lambda r: tuple(str(x) for x in r))

def eq(a, b):
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    try:
        return a == b or float(a) == float(b)
    except (TypeError, ValueError):
        return a == b

n_pass = n_fail = 0
for name, sql in sorted(oracle.items()):
    if ONLY is not None and name not in ONLY:
        continue
    try:
        mine = con.sql(f"SELECT * FROM '{OUT_DIR}/{name}/*.parquet'")
        mtypes = dict(zip(mine.columns, (str(t) for t in mine.types)))
        mcols, mrows = canon(mine.fetchall(), mine.columns)
        ref = con.sql(sql)
        rtypes = dict(zip(ref.columns, (str(t) for t in ref.types)))
        rcols, rrows = canon(ref.fetchall(), ref.columns)
    except Exception as e:
        print(f"FAIL {name}: exception {e}")
        n_fail += 1
        continue
    if [c.lower() for c in mcols] != [c.lower() for c in rcols]:
        print(f"FAIL {name}: columns {mcols} vs {rcols}")
        n_fail += 1
        continue
    # The driver hashes typed values, so a HUGEINT oracle column vs a
    # BIGINT spark column fails its gate even when every value is equal.
    # Compare declared types so the local check can't be looser.
    tbad = [(c, mtypes[c], rtypes[c]) for c in mcols if mtypes[c] != rtypes[c]]
    if tbad:
        print(f"FAIL {name}: column types differ {tbad}")
        n_fail += 1
        continue
    if len(mrows) != len(rrows):
        print(f"FAIL {name}: rowcount {len(mrows)} vs {len(rrows)}")
        n_fail += 1
        continue
    bad = None
    for i, (mr, rr) in enumerate(zip(mrows, rrows)):
        for c, (mv, rv) in enumerate(zip(mr, rr)):
            if not eq(mv, rv):
                bad = (i, mcols[c], mv, rv)
                break
        if bad:
            break
    if bad:
        print(f"FAIL {name}: row {bad[0]} col {bad[1]}: mine={bad[2]!r} oracle={bad[3]!r}")
        n_fail += 1
    else:
        print(f"PASS {name} ({len(mrows)} rows)")
        n_pass += 1

print(f"\n{n_pass} pass, {n_fail} fail / {len(oracle)} total")
sys.exit(1 if n_fail else 0)
