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

Second comparator-visibility class (the round-10 q120 red row): the session
writes parquet timestamps as INT96, which pyarrow reads as timestamp[ns] —
any value outside pandas datetime64[ns] range (1677-09-21 .. 2262-04-11)
silently WRAPS on the driver's side of the compare while DuckDB keeps µs.
This tool therefore also fails on (a) any timestamp column whose min/max
falls outside the ns-safe range, and (b) any result parquet timestamp
column annotated isAdjustedToUTC=true (Spark's TIMESTAMP_MICROS output
type for TimestampType), which reads tz-AWARE in pyarrow/DuckDB and breaks
the naive-timestamp compare the other way. INT96 (the session default for
TimestampType) and INT64 isAdjustedToUTC=false (TimestampNTZ) both read
naive and are fine.
"""
import glob
import json
import os
import sys

import duckdb

# pandas datetime64[ns] representable range, with a day of slack each side.
NS_MIN = "1677-09-22 00:00:00"
NS_MAX = "2262-04-10 23:59:59"


def check_timestamps(con, name, result_glob):
    """Return count of ns-unsafe timestamp findings for one result dir."""
    bad = 0
    rel = con.sql(f"SELECT * FROM read_parquet('{result_glob}')")
    ts_cols = [c for c, t in zip(rel.columns, rel.types)
               if "TIMESTAMP" in str(t).upper()]
    for c in ts_cols:
        lo, hi = con.sql(
            f'SELECT min("{c}"), max("{c}") '
            f"FROM read_parquet('{result_glob}')").fetchone()
        for v in (lo, hi):
            if v is not None and not (str(NS_MIN) <= str(v)[:19] <= str(NS_MAX)):
                print(f"NS-RANGE {name}.{c}: {v} outside pandas "
                      f"datetime64[ns] (wraps in the driver comparator)")
                bad += 1
    if ts_cols:
        # tz-awareness pin: both comparator sides must read tz-NAIVE.
        import pyarrow.parquet as pq
        for f in glob.glob(result_glob):
            sch = pq.read_schema(f)
            for field in sch:
                t = field.type
                if getattr(t, "tz", None):
                    print(f"TZ-AWARE {name}.{field.name}: {t} — "
                          f"isAdjustedToUTC timestamps read tz-aware in "
                          f"pyarrow/DuckDB and break the naive compare "
                          f"(don't set parquet outputTimestampType to "
                          f"TIMESTAMP_MICROS/MILLIS)")
                    bad += 1
            break  # one file is representative; coalesce(1) writes one part
    return bad

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
        bad += check_timestamps(con, name, f"{out_dir}/{name}/*.parquet")
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
