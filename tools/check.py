#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate.

Usage: python3 tools/check.py [sf_dir] [verify_out_dir]

Reads each Spark result parquet written by graft.Verify and the oracle SQL
from oracle_sql.json, runs the SQL in DuckDB against views over the same
testdata parquet, and compares: column names (sorted), row counts, and
values (rows sorted, compared cell-by-cell with exact equality; floats via
repr equality after float64 normalization).
"""
import glob
import json
import math
import os
import sys

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # Exact compare — the driver hashes values verbatim, so any
        # last-bit drift between engines must surface here, not be hidden.
        return repr(v)
    if isinstance(v, list):
        return tuple(norm_cell(x) for x in v)
    return v


# DuckDB types that coerce lossily (hugeint -> float64 etc.) when results
# are fetched as a dataframe, which is how the driver hashes them. An
# oracle whose OUTPUT column has one of these will hash-mismatch even when
# values are equal — round-1 failure mode (sum(BIGINT) -> HUGEINT).
BAD_ORACLE_TYPES = ("HUGEINT", "UHUGEINT", "DECIMAL", "UINTEGER", "UBIGINT")


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    def fresh_con():
        # A fresh connection per query: one long-lived connection OOM'd
        # six mid-sized sf1 oracles AFTER the heavy ones ran (allocator
        # retention across queries), while every one passed isolated.
        # Headroom settings matter only for large-SF replays; harmless at
        # gate SF.
        c = duckdb.connect()
        # 8 threads, not 32: per-thread operator buffers scale with the
        # thread count, and the one oracle that peaks near the box's RAM
        # (s17's near-dup closure at sf1) fits at 8 and OOMs at 16+.
        c.sql("SET memory_limit='100GB'")
        c.sql("SET threads=8")
        c.sql("SET temp_directory='/tmp/duck_check_tmp'")
        for t in TABLES:
            c.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
        return c

    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        spark_dir = f"{out_dir}/{name}"
        if not glob.glob(f"{spark_dir}/*.parquet"):
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        con = fresh_con()
        try:
          try:
            duck = con.sql(sql)
            bad = [(c, str(t)) for c, t in zip(duck.columns, duck.types)
                   if any(b in str(t).upper() for b in BAD_ORACLE_TYPES)]
            if bad:
                print(f"FAIL {name}: lossy oracle output type(s): {bad} "
                      f"(cast to BIGINT/DOUBLE in the SQL)")
                n_fail += 1
                continue
            dcols = sorted(duck.columns)
            drows = duck.fetchall()
            dcolidx = [duck.columns.index(c) for c in dcols]
            drows = sorted(tuple(norm_cell(r[i]) for i in dcolidx) for r in drows)
          except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
          sq = con.sql(f"SELECT * FROM '{spark_dir}/*.parquet'")  # same fresh con
          scols = sorted(sq.columns)
          scolidx = [sq.columns.index(c) for c in scols]
          srows = sorted(tuple(norm_cell(r[i]) for i in scolidx) for r in sq.fetchall())
          if scols != dcols:
            print(f"FAIL {name}: columns spark={scols} duck={dcols}")
            n_fail += 1
            continue
          if len(srows) != len(drows):
            print(f"FAIL {name}: rows spark={len(srows)} duck={len(drows)}")
            n_fail += 1
            continue
          bad = [(a, b) for a, b in zip(srows, drows) if a != b]
          if bad:
            print(f"FAIL {name}: {len(bad)} mismatched rows; first: spark={bad[0][0]} duck={bad[0][1]}")
            n_fail += 1
            continue
          print(f"PASS {name} ({len(srows)} rows)")
          n_pass += 1
        finally:
            con.close()
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
