#!/usr/bin/env python3
"""Column-TYPE gate: the driver's hash comparator goes through pandas, so a
Spark BIGINT column vs a DuckDB DOUBLE/HUGEINT/TINYINT oracle column hashes
differently even when every value compares equal (rows_match=true,
hash_match=false — the round-2 q50/q81 failure mode). This tool diffs the
DuckDB-inferred type of every Spark result column against the oracle
expression's type and fails on any mismatch oracle_check.py can't see.

Usage: dtype_check.py <sfDir> <verifyOutDir>

Types are compared after collapsing DuckDB's integer widths (TINYINT..BIGINT
all land in pandas int64; HUGEINT does NOT, so it stays distinct).
"""
import json
import os
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

# pandas dtype equivalence classes for parquet/duckdb scalar types.
COLLAPSE = {
    "TINYINT": "int64", "SMALLINT": "int64", "INTEGER": "int64",
    "BIGINT": "int64",
    "UTINYINT": "int64", "USMALLINT": "int64", "UINTEGER": "int64",
    "FLOAT": "float64", "DOUBLE": "float64",
}


def klass(t):
    t = str(t)
    return COLLAPSE.get(t, t)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

    results = sorted(d for d in os.listdir(out_dir)
                     if os.path.isdir(os.path.join(out_dir, d)))
    bad = 0
    for name in results:
        if name not in oracle:
            continue
        got = con.sql(f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
        orc = con.sql(oracle[name])
        gt = {c: klass(t) for c, t in zip(got.columns, got.types)}
        ot = {c: klass(t) for c, t in zip(orc.columns, orc.types)}
        for c in sorted(set(gt) & set(ot)):
            if gt[c] != ot[c]:
                print(f"TYPE-MISMATCH {name}.{c}: spark={gt[c]} oracle={ot[c]}")
                bad += 1
    if bad:
        print(f"\n{bad} type mismatches")
        sys.exit(1)
    print("all column types aligned")


if __name__ == "__main__":
    main()
