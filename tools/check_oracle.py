#!/usr/bin/env python3
"""Local dev mirror of the driver's correctness gate (NOT part of the
engine — the engine is the Scala library). Runs DuckDB on the oracle SQL
dumped by graft.Verify and compares against the Spark parquet outputs.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir> [--strict] [--only]
  --strict: exact value equality (no float rounding) — the driver's hash
  compare may be exact, so strict must also pass.
  --only: compare only queries actually dumped in <verifyOutDir> (for
  filtered Verify runs — otherwise every undumped query reports FAIL).
"""
import sys, json, glob, os
import duckdb

STRICT = "--strict" in sys.argv
ONLY_DUMPED = "--only" in sys.argv

def norm(v):
    if isinstance(v, float) and not STRICT:
        return round(v, 6)
    return v

def key(row):
    # None-safe total order for sorting mixed-null rows
    return tuple((v is None, str(type(v)), v if v is not None else 0) for v in row)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        t = os.path.basename(p)[:-len(".parquet")]
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        spark_dir = os.path.join(out_dir, name)
        if not os.path.isdir(spark_dir):
            if ONLY_DUMPED:
                continue
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')").fetchall()
            got_cols = [d[0] for d in con.description]
            want = con.execute(sql).fetchall()
            want_cols = [d[0] for d in con.description]
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        # driver sorts columns by name before hashing values
        gi = [got_cols.index(c) for c in sorted(got_cols)]
        wi = [want_cols.index(c) for c in sorted(want_cols)]
        g = sorted((tuple(norm(r[i]) for i in gi) for r in got), key=key)
        w = sorted((tuple(norm(r[i]) for i in wi) for r in want), key=key)
        if sorted(got_cols) != sorted(want_cols):
            print(f"FAIL {name}: columns {sorted(got_cols)} != {sorted(want_cols)}")
            n_fail += 1
        elif g != w:
            diff = [(a, b) for a, b in zip(g, w) if a != b][:3]
            print(f"FAIL {name}: {len(g)} vs {len(w)} rows; first diffs: {diff}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(g)} rows)"); n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
