#!/usr/bin/env python3
"""Scale the driver-generated test data N-fold, distribution-preservingly.

Usage: python3 tools/gen_sf.py <srcDir> <outDir> [N=10]

Produces an N-fold copy of every table with referentially-consistent
key shifts (1e8 per copy), designed so per-copy data DISTRIBUTIONS
match the source — the property a scale test needs (super-linear
plans show up as super-linear, nothing else changes):

- documents: copy i>0 prefixes every token with "c<i>", so each
  copy's duplicate/near-dup structure and shingle-df distribution
  equal the source's, while copies share no vocabulary (a naive
  verbatim copy would multiply duplicate-cluster sizes by N and make
  every quadratic-in-cluster op look N^2, which measures the data
  change, not the engine).
- embeddings: copy i cyclically shifts each vector by i dimensions —
  within-copy cosine geometry is exactly the source's; across copies
  vectors decorrelate.
- events: written via pyarrow to preserve the timestamp[ns] physical
  type (Tables.events floors raw nanos; a DuckDB rewrite would
  silently downcast to us and break the nanosAsLong read path).
- region/nation: copied 1:1 (fixed-cardinality dims).
"""
import sys
import shutil

import duckdb
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

B = 100_000_000


def main(src, out, n):
    con = duckdb.connect()

    for t in ["region", "nation"]:
        shutil.copy(f"{src}/{t}.parquet", f"{out}/{t}.parquet")

    def gen(t, tpl):
        parts = " UNION ALL ".join(tpl.format(i=i) for i in range(n))
        con.execute(f"COPY ({parts}) TO '{out}/{t}.parquet' (FORMAT PARQUET)")

    gen("customer", f"SELECT c_custkey + {{i}}::BIGINT*{B} AS c_custkey, c_name, "
        f"c_nationkey, c_acctbal, c_mktsegment "
        f"FROM read_parquet('{src}/customer.parquet')")
    gen("supplier", f"SELECT s_suppkey + {{i}}::BIGINT*{B} AS s_suppkey, s_name, "
        f"s_nationkey, s_acctbal FROM read_parquet('{src}/supplier.parquet')")
    gen("part", f"SELECT p_partkey + {{i}}::BIGINT*{B} AS p_partkey, p_name, p_brand, "
        f"p_type, p_size, p_retailprice FROM read_parquet('{src}/part.parquet')")
    gen("orders", f"SELECT o_orderkey + {{i}}::BIGINT*{B} AS o_orderkey, "
        f"o_custkey + {{i}}::BIGINT*{B} AS o_custkey, o_orderstatus, o_totalprice, "
        f"o_orderdate, o_orderpriority FROM read_parquet('{src}/orders.parquet')")
    gen("lineitem", f"SELECT l_orderkey + {{i}}::BIGINT*{B} AS l_orderkey, "
        f"l_partkey + {{i}}::BIGINT*{B} AS l_partkey, l_suppkey + {{i}}::BIGINT*{B} AS l_suppkey, "
        f"l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax, "
        f"l_returnflag, l_linestatus, l_shipdate "
        f"FROM read_parquet('{src}/lineitem.parquet')")
    gen("documents", (
        f"SELECT doc_id + {{i}}::BIGINT*{B} AS doc_id, "
        f"CASE WHEN {{i}} = 0 THEN text ELSE array_to_string("
        f"list_transform(string_split(text, ' '), t -> 'c{{i}}' || t), ' ') "
        f"END AS text, lang, source, "
        f"CAST(length(CASE WHEN {{i}} = 0 THEN text ELSE array_to_string("
        f"list_transform(string_split(text, ' '), t -> 'c{{i}}' || t), ' ') "
        f"END) AS BIGINT) AS n_chars "
        f"FROM read_parquet('{src}/documents.parquet')"))
    gen("embeddings", (
        f"SELECT vec_id + {{i}}::BIGINT*{B} AS vec_id, "
        f"CAST(list_slice(embedding, {{i}} % 64 + 1, 64) || "
        f"list_slice(embedding, 1, {{i}} % 64) AS FLOAT[]) AS embedding, label "
        f"FROM read_parquet('{src}/embeddings.parquet')"))

    t = pq.read_table(f"{src}/events.parquet")
    chunks = []
    for i in range(n):
        shift = pa.scalar(i * B, type=pa.int64())
        chunks.append(pa.table({
            "event_id": pc.add(t["event_id"], shift),
            "ts": t["ts"],
            "user_id": pc.add(t["user_id"], shift),
            "event_type": t["event_type"],
            "value": t["value"],
            "props": t["props"],
        }))
    pq.write_table(pa.concat_tables(chunks), f"{out}/events.parquet")

    for tb in ["customer", "supplier", "part", "orders", "lineitem",
               "documents", "embeddings", "events"]:
        print(tb, con.sql(
            f"select count(*) from read_parquet('{out}/{tb}.parquet')"
        ).fetchone()[0])


if __name__ == "__main__":
    import os
    src, out = sys.argv[1], sys.argv[2]
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    os.makedirs(out, exist_ok=True)
    main(src, out, n)
