#!/usr/bin/env python3
"""Build a 100x-inflated sf10 SPOT-CERTIFICATION FIXTURE from the sf1
fixture (which tools/make_sf1.py builds from the read-only sf0.1 tables).

Output: /root/repo/target/sf10/*.parquet (never touches /root/testdata).
Same distribution-preserving rules as make_sf1.py, applied once more on
top of sf1 (offsets 10x the sf1 domains):

- relational tables: key-shifted self-union, referential integrity held
  copy-wise;
- events: 10x density per time window, shifted ids;
- documents: copy 0 verbatim, copies 1-9 token-PERMUTED (t-family stats
  hold, near-dup relations do not degenerate into planted exact twins);
- embeddings: copies 1-9 get fresh hash-seeded unit vectors.

sf10 is for the heavy-tail spot certification (SCALING.md): ~60M
lineitem / 10M events / 500k documents / 200k vectors in ~128 GiB.
"""
import math
import os

import duckdb

BASE = "/root/repo/target/sf1"
OUT = "/root/repo/target/sf10"
COPIES = 10

# sf1 key domains = 10x the sf0.1 ones make_sf1.py shifted by.
OFFS = dict(cust=150000, order=1500000, part=200000, supp=10000,
            event=1000000, doc=50000, vec=20000)


def main():
    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()
    con.sql("SET threads TO 16")
    con.sql("SET memory_limit='80GB'")
    con.sql("SET temp_directory='/tmp/duck_sf10_tmp'")
    c = "(SELECT unnest(range(%d)) AS copy)" % COPIES

    def write(name, sql):
        con.sql(f"COPY ({sql}) TO '{OUT}/{name}.parquet' (FORMAT PARQUET)")
        n = con.sql(f"SELECT count(*) FROM '{OUT}/{name}.parquet'").fetchone()[0]
        print(f"{name}: {n} rows", flush=True)

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

    write("embeddings", f"""
      WITH src AS (SELECT * FROM '{BASE}/embeddings.parquet', {c}),
      keep AS (
        SELECT vec_id + copy * {OFFS['vec']} AS vec_id, embedding, label
        FROM src WHERE copy = 0
      ),
      raw AS (
        SELECT vec_id + copy * {OFFS['vec']} AS vec_id, label,
               list_transform(range(64), i ->
                 sqrt(-2 * ln((CAST(hash(vec_id, copy, i, 3) % 1048576
                                AS DOUBLE) + 0.5) / 1048576.0)) *
                 cos(2 * {math.pi} * (CAST(hash(vec_id, copy, i, 4) % 1048576
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
