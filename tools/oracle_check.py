#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: oracle_check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify), runs the
matching oracle SQL from oracle_sql.json in DuckDB against views of the
sfDir parquet tables, sorts columns by name and rows by all columns, and
compares. Reports PASS/FAIL per query with a diff sample on mismatch.
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(con, rel_sql):
    """Return (columns_sorted, rows) canonicalised for comparison."""
    rel = con.sql(rel_sql)
    cols = sorted(rel.columns)
    quoted = ", ".join(f'"{c}"' for c in cols)
    rows = con.sql(f"SELECT {quoted} FROM ({rel_sql}) ORDER BY ALL").fetchall()
    return cols, rows


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def eq(a, b):
    a, b = norm(a), norm(b)
    if isinstance(a, float) and isinstance(b, float):
        if a == b:
            return True
        return abs(a - b) <= 1e-9 * max(1.0, abs(a), abs(b))
    if isinstance(a, list) and isinstance(b, list):
        return len(a) == len(b) and all(eq(x, y) for x, y in zip(a, b))
    return a == b


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

    import os
    results = sorted(d for d in os.listdir(out_dir)
                     if os.path.isdir(os.path.join(out_dir, d)))
    n_pass = n_fail = n_noracle = 0
    for name in results:
        got_sql = f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')"
        try:
            gcols, grows = canon(con, got_sql)
        except Exception as e:
            print(f"FAIL {name}: cannot read result: {e}")
            n_fail += 1
            continue
        if name not in oracle:
            print(f"SKIP {name}: no oracle ({len(grows)} rows)")
            n_noracle += 1
            continue
        try:
            ocols, orows = canon(con, f"SELECT * FROM ({oracle[name]})")
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        if gcols != ocols:
            print(f"FAIL {name}: columns differ: got {gcols} vs oracle {ocols}")
            n_fail += 1
            continue
        if len(grows) != len(orows):
            print(f"FAIL {name}: row count {len(grows)} vs oracle {len(orows)}")
            n_fail += 1
            continue
        bad = None
        exact = True
        for i, (g, o) in enumerate(zip(grows, orows)):
            if g != o:
                exact = False
                if not all(eq(a, b) for a, b in zip(g, o)):
                    bad = (i, g, o)
                    break
        if bad:
            i, g, o = bad
            print(f"FAIL {name}: row {i} differs\n  got    {g}\n  oracle {o}")
            n_fail += 1
        elif not exact:
            print(f"WARN {name}: PASS within 1e-9 but not bit-exact "
                  f"({len(grows)} rows) — tighten rounding")
            n_pass += 1
        else:
            print(f"PASS {name} ({len(grows)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_noracle} no-oracle")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
