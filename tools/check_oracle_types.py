#!/usr/bin/env python3
"""Oracle type-portability gate (dev/test tooling, NOT part of the engine).

DuckDB silently promotes sum(BIGINT) -> HUGEINT (and builds DECIMALs out of
numeric literals), which hash-mismatches against Spark's BIGINT/DOUBLE even
when every value is identical — this redded q_cusum in round 6. This tool
binds every SparkEntry.oracleSql text in DuckDB (no execution: types come
from the bound relation) and fails if any OUTPUT column's type is outside
the portable set that round-trips 1:1 with Spark's writer.

Usage: python3 tools/check_oracle_types.py <sfDir> <oracleSqlJson> [--list]
  --list: dump every (query, column, type) instead of only violations.
"""
import sys, json, glob, os
import duckdb

PORTABLE = {
    "BIGINT", "INTEGER", "DOUBLE", "FLOAT", "VARCHAR", "BOOLEAN",
    "DATE", "TIMESTAMP",
    # JSON fetches as its string form — value-compares 1:1 with Spark's
    # to_json() VARCHAR (q_index_build, green since r4). The hazard this
    # gate exists for is numeric promotion (HUGEINT/DECIMAL), not JSON.
    "JSON",
}

def portable_str(s):
    # String-level fallback for duckdb builds whose DuckDBPyType lacks
    # .id/.children (older Python API): recurse through the rendered type
    # text. Conservative — an unparseable container is non-portable.
    s = s.strip()
    if s in PORTABLE:
        return True
    if s.endswith("[]"):  # list renders as ELEM[]
        return portable_str(s[:-2])
    for prefix in ("STRUCT(", "MAP("):
        if s.startswith(prefix) and s.endswith(")"):
            body, depth, parts, cur = s[len(prefix):-1], 0, [], []
            for ch in body:
                if ch in "(<[":
                    depth += 1
                elif ch in ")>]":
                    depth -= 1
                if ch == "," and depth == 0:
                    parts.append("".join(cur)); cur = []
                else:
                    cur.append(ch)
            parts.append("".join(cur))
            if prefix == "MAP(":  # MAP(K, V): both positions are types
                return all(portable_str(p) for p in parts)
            # STRUCT fields render as `name TYPE` — drop the name token.
            # A quoted field name may itself contain spaces ("my col"
            # BIGINT): strip the quoted identifier first, or the split
            # would yield a garbage type token (safe-direction false
            # positive, but a false positive nonetheless).
            def field_type(p):
                p = p.strip()
                if p.startswith('"'):
                    end = p.find('"', 1)
                    while end != -1 and p[end:end + 2] == '""':  # escaped ""
                        end = p.find('"', end + 2)
                    if end != -1:
                        return p[end + 1:].strip()
                return p.split(" ", 1)[-1]
            return all(portable_str(field_type(p)) for p in parts)
    return False

def portable(t):
    # Recurse through nested types via the duckdb type API — a HUGEINT
    # hiding inside a struct field or list element is exactly as fatal to
    # the hash compare as a top-level one. Verified against duckdb 1.x
    # (DuckDBPyType.id/.children); older builds without .children fall
    # back to parsing the rendered type string.
    tid = getattr(t, "id", None)
    if tid in ("struct", "list", "map"):
        try:
            children = t.children  # [(name, type)] pairs
        except Exception:
            return portable_str(str(t))
        return all(portable(ct) for _, ct in children)
    return str(t) in PORTABLE

def main(sf_dir, oracle_json, list_all=False):
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        t = os.path.basename(p)[: -len(".parquet")]
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(oracle_json))
    bad = []
    for name, sql in sorted(oracle.items()):
        try:
            rel = con.sql(sql)
        except Exception as e:
            bad.append((name, "<bind>", f"BIND-ERROR: {e}"))
            continue
        for c, t in zip(rel.columns, rel.types):
            if list_all:
                print(f"{name}\t{c}\t{t}")
            if not portable(t):
                bad.append((name, c, str(t)))
    if bad:
        for name, c, t in bad:
            print(f"NONPORTABLE {name}.{c}: {t}")
        print(f"== {len(bad)} non-portable oracle columns ==")
        return 1
    print(f"== all {len(oracle)} oracles portable ==")
    return 0

def selftest():
    # Unit cases for the string-level fallback — especially the
    # quoted-identifier handling (ADVICE r9: a STRUCT field rendered as
    # `"my col" BIGINT` used to split on the first space and test the
    # garbage token `col" BIGINT` as a type → false positive).
    cases = [
        ("BIGINT", True),
        ("HUGEINT", False),
        ("DECIMAL(38,0)", False),
        ("BIGINT[]", True),
        ("HUGEINT[]", False),
        ('STRUCT(a BIGINT, b VARCHAR)', True),
        ('STRUCT(a HUGEINT)', False),
        ('STRUCT("my col" BIGINT)', True),          # quoted name w/ space
        ('STRUCT("my col" HUGEINT)', False),        # …still catches the type
        ('STRUCT("odd""name" BIGINT)', True),       # escaped "" in the name
        ('STRUCT("odd""name" HUGEINT)', False),
        ('MAP(VARCHAR, BIGINT)', True),
        ('MAP(VARCHAR, HUGEINT)', False),
        ('STRUCT(a STRUCT(b BIGINT[], c VARCHAR))', True),
        ('STRUCT(a STRUCT(b HUGEINT))', False),
    ]
    failed = [(s, want, portable_str(s)) for s, want in cases
              if portable_str(s) != want]
    for s, want, got in failed:
        print(f"SELFTEST FAIL portable_str({s!r}) = {got}, want {want}")
    print("selftest OK" if not failed else f"== {len(failed)} selftest failures ==")
    return 1 if failed else 0

if __name__ == "__main__":
    if "--selftest" in sys.argv:
        sys.exit(selftest())
    sys.exit(main(sys.argv[1], sys.argv[2], "--list" in sys.argv))
