#!/usr/bin/env python3
"""Compare two graft.Verify output dirs for value-identical results.

Usage: python3 tools/check_determinism.py <outDirA> <outDirB>

Each Verify output dir contains one SUBDIRECTORY per query (named
q_<name>, no .parquet suffix) holding part files. EXCEPT ALL in both
directions catches row differences AND multiplicity differences.
"""
import sys, os
import duckdb

a, b = sys.argv[1], sys.argv[2]
names = sorted(d for d in os.listdir(a) if d.startswith("q_"))
names_b = {d for d in os.listdir(b) if d.startswith("q_")}
missing = [n for n in names if n not in names_b]
bad = []
for name in names:
    if name in missing:
        continue
    try:
        n = duckdb.sql(
            f"SELECT count(*) FROM (SELECT * FROM '{a}/{name}/*.parquet' "
            f"EXCEPT ALL SELECT * FROM '{b}/{name}/*.parquet')").fetchone()[0]
        m = duckdb.sql(
            f"SELECT count(*) FROM (SELECT * FROM '{b}/{name}/*.parquet' "
            f"EXCEPT ALL SELECT * FROM '{a}/{name}/*.parquet')").fetchone()[0]
        if n or m:
            bad.append((name, n, m))
    except Exception as e:
        bad.append((name, "ERR", str(e)[:100]))
if not names:
    print("FAIL: no q_* dirs found — wrong path?")
    sys.exit(2)
if missing:
    print("MISSING in B:", missing)
for item in bad:
    print("DIFF", *item)
print(f"== compared {len(names) - len(missing)} queries: "
      f"{'ALL IDENTICAL' if not bad and not missing else f'{len(bad)} differ'} ==")
sys.exit(0 if not bad and not missing else 1)
