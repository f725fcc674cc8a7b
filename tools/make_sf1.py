#!/usr/bin/env python3
"""Build a 10x-inflated sf1 BENCH FIXTURE from the read-only sf0.1 tables.

Output: /root/repo/target/sf1/*.parquet (never touches /root/testdata).
This exists purely for the sf1 scaling certification (SCALING.md): the
correctness gate stays on the driver's sf0.01 data; this fixture only has
to preserve each table's DISTRIBUTION so per-family timings scale
honestly:

- Relational tables inflate by key-shifted self-union (10 copies, offsets
  above each key domain) so referential integrity holds copy-wise:
  lineitem->orders->customer, part/supplier FKs, events.user_id->customer.
- events keep their timestamps (10x density per window - the realistic
  way event volume grows) and shift event_id/user_id.
- documents copies keep doc 0's copy verbatim; copies 1-9 PERMUTE each
  doc's tokens deterministically. Token/vocab/length statistics are
  unchanged (the t-family scales honestly) while 3-gram shingles are
  destroyed, so the d-family's near-dup relation does NOT degenerate into
  every doc having 9 exact twins (which would inflate pair outputs ~100x
  and measure a different workload).
- embeddings copies 1-9 get FRESH unit vectors (hash-seeded gaussian via
  Box-Muller, normalized - matching the original uniform-on-sphere
  distribution, element sigma 1/8) so the v/e-families face 10x the
  corpus, not 9 planted exact duplicates per vector.
"""
import math
import os

import duckdb

BASE = "/root/testdata/sf0.1"
OUT = "/root/repo/target/sf1"
COPIES = 10

OFFS = dict(cust=15000, order=150000, part=20000, supp=1000,
            event=100000, doc=5000, vec=2000)


def main():
    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()
    con.sql("SET threads TO 16")
    c = "(SELECT unnest(range(%d)) AS copy)" % COPIES

    def write(name, sql):
        con.sql(f"COPY ({sql}) TO '{OUT}/{name}.parquet' (FORMAT PARQUET)")
        n = con.sql(f"SELECT count(*) FROM '{OUT}/{name}.parquet'").fetchone()[0]
        print(f"{name}: {n} rows")

    for t in ("region", "nation"):
        write(t, f"SELECT * FROM '{BASE}/{t}.parquet'")

    write("customer", f"""
      SELECT c_custkey + copy * {OFFS['cust']} AS c_custkey, c_name,
             c_nationkey, c_acctbal, c_mktsegment
      FROM '{BASE}/customer.parquet', {c}""")
    write("supplier", f"""
      SELECT s_suppkey + copy * {OFFS['supp']} AS s_suppkey, s_name,
             s_nationkey, s_acctbal
      FROM '{BASE}/supplier.parquet', {c}""")
    write("part", f"""
      SELECT p_partkey + copy * {OFFS['part']} AS p_partkey, p_name,
             p_brand, p_type, p_size, p_retailprice
      FROM '{BASE}/part.parquet', {c}""")
    write("orders", f"""
      SELECT o_orderkey + copy * {OFFS['order']} AS o_orderkey,
             o_custkey + copy * {OFFS['cust']} AS o_custkey,
             o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
      FROM '{BASE}/orders.parquet', {c}""")
    write("lineitem", f"""
      SELECT l_orderkey + copy * {OFFS['order']} AS l_orderkey,
             l_partkey + copy * {OFFS['part']} AS l_partkey,
             l_suppkey + copy * {OFFS['supp']} AS l_suppkey,
             l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
             l_returnflag, l_linestatus, l_shipdate
      FROM '{BASE}/lineitem.parquet', {c}""")
    write("events", f"""
      SELECT event_id + copy * {OFFS['event']} AS event_id, ts,
             user_id + copy * {OFFS['cust']} AS user_id,
             event_type, value, props
      FROM '{BASE}/events.parquet', {c}""")

    write("documents", f"""
      WITH src AS (SELECT * FROM '{BASE}/documents.parquet', {c}),
      keep AS (
        SELECT doc_id + copy * {OFFS['doc']} AS doc_id, text, lang, source,
               n_chars
        FROM src WHERE copy = 0
      ),
      toks AS (
        SELECT doc_id + copy * {OFFS['doc']} AS doc_id, copy, lang, source,
               unnest(list_filter(string_split(text, ' '), x -> x <> ''))
                 AS tok,
               unnest(range(1, len(list_filter(string_split(text, ' '),
                 x -> x <> '')) + 1)) AS pos
        FROM src WHERE copy > 0
      ),
      perm AS (
        SELECT doc_id, any_value(lang) AS lang, any_value(source) AS source,
               string_agg(tok, ' ' ORDER BY hash(doc_id, pos), pos) AS text
        FROM toks GROUP BY doc_id
      )
      SELECT doc_id, text, lang, source, n_chars FROM keep
      UNION ALL
      SELECT doc_id, text, lang, source, length(text) AS n_chars FROM perm""")

    # Fresh unit vectors for copies 1-9: Box-Muller from two hash-derived
    # uniforms per element, then L2-normalized.
    write("embeddings", f"""
      WITH src AS (SELECT * FROM '{BASE}/embeddings.parquet', {c}),
      keep AS (
        SELECT vec_id + copy * {OFFS['vec']} AS vec_id, embedding, label
        FROM src WHERE copy = 0
      ),
      raw AS (
        SELECT vec_id + copy * {OFFS['vec']} AS vec_id, label,
               list_transform(range(64), i ->
                 sqrt(-2 * ln((CAST(hash(vec_id, copy, i, 1) % 1048576
                                AS DOUBLE) + 0.5) / 1048576.0)) *
                 cos(2 * {math.pi} * (CAST(hash(vec_id, copy, i, 2) % 1048576
                                AS DOUBLE) / 1048576.0))) AS g
        FROM src WHERE copy > 0
      ),
      normed AS (
        SELECT vec_id, label,
               CAST(list_transform(g, x ->
                 x / sqrt(list_sum(list_transform(g, y -> y * y))))
                 AS FLOAT[]) AS embedding
        FROM raw
      )
      SELECT vec_id, embedding, label FROM keep
      UNION ALL
      SELECT vec_id, embedding, label FROM normed""")


if __name__ == "__main__":
    main()
