#!/usr/bin/env python3
"""Diff two graft.Verify output directories cell-by-cell.

Usage: python3 tools/diff_runs.py <out_dir_a> <out_dir_b>

Used to prove run-to-run and partitioning invariance: every query output
must be bit-identical (modulo row order) between repeated runs and
between runs at different parallelism (SPARK_GRAFT_CPUS). A query that
differs is relying on summation order, unstable sorts, or an RNG — all
of which eventually flip a driver hash check.
"""
import os
import sys

import duckdb


def main():
    a_dir, b_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    diff = 0

    def dirs(d):
        return {n for n in os.listdir(d) if os.path.isdir(os.path.join(d, n))}

    # Union, not intersection: a query present in only one run (e.g. a
    # partial/crashed run) must count as a difference, not be skipped.
    names = sorted(dirs(a_dir) | dirs(b_dir))
    for n in names:
        if not (os.path.isdir(f"{a_dir}/{n}") and os.path.isdir(f"{b_dir}/{n}")):
            print(f"DIFFERS: {n} (present in only one run)")
            diff += 1
            continue
        a = con.sql(f"SELECT * FROM '{a_dir}/{n}/*.parquet'").fetchall()
        b = con.sql(f"SELECT * FROM '{b_dir}/{n}/*.parquet'").fetchall()
        if sorted(map(repr, a)) != sorted(map(repr, b)):
            print(f"DIFFERS: {n}")
            diff += 1
    print(f"{diff} of {len(names)} queries differ")
    return 1 if diff else 0


if __name__ == "__main__":
    sys.exit(main())
