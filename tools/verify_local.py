#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/verify_local.py [sfDir] [outDir]

Assumes `sbt "runMain graft.Verify <sfDir> <outDir>"` has already produced
<outDir>/<name>/ parquet dirs + oracle_sql.json. Registers each testdata
table as a DuckDB view, runs every oracle SQL, and compares against the
Spark parquet dump: schema (column names), row count, and values
(columns sorted by name, rows in emitted order).
"""
import json, sys, glob, os
import duckdb

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"

con = duckdb.connect()
for t in ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split():
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

oracle = json.load(open(f"{out}/oracle_sql.json"))
try:
    manifest = json.load(open(f"{out}/manifest.json"))
except FileNotFoundError:
    manifest = sorted(d for d in os.listdir(out)
                      if os.path.isdir(f"{out}/{d}"))
fails = 0
for name in manifest:
    pdir = f"{out}/{name}"
    if not os.path.isdir(pdir):
        print(f"FAIL {name}: query produced no output (threw in Verify)")
        fails += 1
        continue
    files = glob.glob(f"{pdir}/*.parquet")
    if not files:
        print(f"FAIL {name}: no parquet output"); fails += 1; continue
    got = con.execute(f"SELECT * FROM '{pdir}/*.parquet'").df()
    if name not in oracle:
        print(f"okay {name}: rows={len(got)} (no oracle — rows-only check)")
        if len(got) == 0:
            print(f"FAIL {name}: 0 rows"); fails += 1
        continue
    # Type sweep (VERDICT r9 #1): the driver hashes TYPED values, so a
    # DuckDB type the pandas compare below coerces away (HUGEINT from an
    # uncast sum(), UHUGEINT, DECIMAL from integer division) still fails
    # the driver gate even when every value matches. Catch the class here.
    otypes = con.execute(f"DESCRIBE ({oracle[name]})").df()
    widened = [f"{r.column_name}:{r.column_type}"
               for r in otypes.itertuples()
               if any(t in str(r.column_type).upper()
                      for t in ("HUGEINT", "UHUGEINT", "DECIMAL"))]
    if widened:
        print(f"FAIL {name}: oracle emits driver-hostile type(s) "
              f"{widened} — cast to ::BIGINT in the oracle SQL")
        fails += 1
        continue
    exp = con.execute(oracle[name]).df()
    gcols, ecols = sorted(got.columns), sorted(exp.columns)
    if gcols != ecols:
        print(f"FAIL {name}: schema {gcols} != {ecols}"); fails += 1; continue
    if len(got) != len(exp):
        print(f"FAIL {name}: rows {len(got)} != {len(exp)}"); fails += 1; continue
    g, e = got[gcols].reset_index(drop=True), exp[ecols].reset_index(drop=True)
    bad = []
    for c in gcols:
        gc, ec = g[c], e[c]
        try:
            import pandas as pd
            neq = ~((gc == ec) | (gc.isna() & ec.isna()))
        except Exception:
            neq = gc.astype(str) != ec.astype(str)
        if neq.any():
            i = int(neq.idxmax())
            bad.append(f"{c}[row {i}]: spark={gc[i]!r} oracle={ec[i]!r} "
                       f"({int(neq.sum())} diffs)")
    if bad:
        print(f"FAIL {name}: " + "; ".join(bad[:3])); fails += 1
    else:
        print(f"PASS {name}: rows={len(got)} cols={len(gcols)}")

print(f"\n{'ALL GREEN' if fails == 0 else f'{fails} FAILURES'}")
sys.exit(1 if fails else 0)
