"""Generate /tmp/sf1 from /root/testdata/sf0.1 for scaling measurements.

Deterministic 10x replication with key shifting (the TPC-H scaling
model: more customers, not longer histories — join fan-outs and group
cardinalities preserved exactly), word-list rotation per document
replica (replicas are not near-duplicates, so LSH candidate structure
stays natural), and element rotation per embedding replica
(norm-preserving, direction-changing). Output parquet lands in DuckDB's
default ~123k-row row groups, so sf1 also exercises multi-row-group
scan parallelism that the single-row-group testdata cannot.

Usage: python tools/gen_sf1.py [src_dir] [out_dir] [replicas]
Evidence consumed by BASELINE.md "Scaling evidence" (round 4).
"""

from __future__ import annotations

import os
import sys

import duckdb


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 10

    os.makedirs(out, exist_ok=True)  # COPY TO fails on a missing directory
    con = duckdb.connect()
    mx = {}
    for t, k in [
        ("customer", "c_custkey"), ("orders", "o_orderkey"),
        ("supplier", "s_suppkey"), ("part", "p_partkey"),
        ("events", "event_id"), ("events", "user_id"),
        ("documents", "doc_id"), ("embeddings", "vec_id"),
    ]:
        mx[k] = con.execute(f"select max({k})+1 from '{src}/{t}.parquet'").fetchone()[0]

    rep = f"(SELECT unnest(generate_series(0, {reps - 1})) AS r)"

    def gen(name: str, sql: str) -> None:
        con.execute(f"COPY ({sql}) TO '{out}/{name}.parquet' (FORMAT parquet)")

    for t in ("region", "nation"):
        gen(t, f"SELECT * FROM '{src}/{t}.parquet'")
    gen("customer", f"""
        SELECT c_custkey + r*{mx['c_custkey']} AS c_custkey, c_name, c_nationkey,
               c_acctbal, c_mktsegment
        FROM '{src}/customer.parquet' CROSS JOIN {rep}""")
    gen("supplier", f"""
        SELECT s_suppkey + r*{mx['s_suppkey']} AS s_suppkey, s_name, s_nationkey, s_acctbal
        FROM '{src}/supplier.parquet' CROSS JOIN {rep}""")
    gen("part", f"""
        SELECT p_partkey + r*{mx['p_partkey']} AS p_partkey, p_name, p_brand, p_type,
               p_size, p_retailprice
        FROM '{src}/part.parquet' CROSS JOIN {rep}""")
    gen("orders", f"""
        SELECT o_orderkey + r*{mx['o_orderkey']} AS o_orderkey,
               o_custkey + r*{mx['c_custkey']} AS o_custkey,
               o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        FROM '{src}/orders.parquet' CROSS JOIN {rep}""")
    gen("lineitem", f"""
        SELECT l_orderkey + r*{mx['o_orderkey']} AS l_orderkey,
               l_partkey + r*{mx['p_partkey']} AS l_partkey,
               l_suppkey + r*{mx['s_suppkey']} AS l_suppkey,
               l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
               l_returnflag, l_linestatus, l_shipdate
        FROM '{src}/lineitem.parquet' CROSS JOIN {rep}""")
    gen("events", f"""
        SELECT event_id + r*{mx['event_id']} AS event_id, ts,
               user_id + r*{mx['user_id']} AS user_id, event_type, value, props
        FROM '{src}/events.parquet' CROSS JOIN {rep}""")
    gen("documents", f"""
        SELECT doc_id + r*{mx['doc_id']} AS doc_id,
               CASE WHEN r = 0 THEN text ELSE
                 array_to_string(list_concat(toks[1 + (r % len(toks)):],
                                             toks[1:(r % len(toks))]), ' ')
               END AS text,
               lang, source,
               CAST(length(CASE WHEN r = 0 THEN text ELSE
                 array_to_string(list_concat(toks[1 + (r % len(toks)):],
                                             toks[1:(r % len(toks))]), ' ')
               END) AS BIGINT) AS n_chars
        FROM (SELECT *, regexp_split_to_array(trim(text), '\\s+') AS toks
              FROM '{src}/documents.parquet')
        CROSS JOIN {rep}""")
    gen("embeddings", f"""
        SELECT vec_id + r*{mx['vec_id']} AS vec_id,
               CASE WHEN r = 0 THEN embedding ELSE
                 list_concat(embedding[1 + (r % len(embedding)):],
                             embedding[1:(r % len(embedding))])
               END AS embedding,
               label
        FROM '{src}/embeddings.parquet' CROSS JOIN {rep}""")


if __name__ == "__main__":
    main()
