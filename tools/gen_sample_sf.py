#!/usr/bin/env python3
"""Build an md5-deterministic SAMPLED twin of an SF dir for large-SF
oracle validation (the sampleMod contract the recall audits use).

The heavy oracle families (shingle explosions, per-row recursive
CTEs) cannot finish against the full 100x gate tables inside any
sane budget — but parity does not need the full corpus: both engines
read the SAME sampled parquet, so a hash-exact verdict on the sample
is a real cross-engine proof of the operator at sf10-scale row
widths and value distributions.

Sampling is md5-deterministic per entity so it is reproducible and
id-pattern-free:
  documents   : md5(doc_id)    % doc_mod   == 0   (default 1/8)
  embeddings  : md5(vec_id)    % doc_mod   == 0   (aligned id space)
  events      : md5(user_id)   % user_mod  == 0   (whole users, 1/16)
  orders      : md5(o_orderkey)% user_mod  == 0   (whole orders)
  lineitem    : semi-join on the kept orders (FK-consistent)
  others      : hard-linked full (dimension tables are small)

Usage: python3 tools/gen_sample_sf.py <srcDir> <dstDir> [doc_mod] [user_mod]
"""
import os
import sys

import duckdb


def md5_mod(col, mod):
    return (f"('0x' || substr(md5(CAST({col} AS VARCHAR)), 1, 15))"
            f"::BIGINT % {mod} = 0")


def main():
    src, dst = sys.argv[1], sys.argv[2]
    doc_mod = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    user_mod = int(sys.argv[4]) if len(sys.argv) > 4 else 16
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    sampled = {
        "documents": md5_mod("doc_id", doc_mod),
        "embeddings": md5_mod("vec_id", doc_mod),
        "events": md5_mod("user_id", user_mod),
        "orders": md5_mod("o_orderkey", user_mod),
    }
    for t, pred in sampled.items():
        con.execute(
            f"COPY (SELECT * FROM '{src}/{t}.parquet' WHERE {pred}) "
            f"TO '{dst}/{t}.parquet' (FORMAT PARQUET)")
    con.execute(
        f"COPY (SELECT l.* FROM '{src}/lineitem.parquet' l "
        f"WHERE EXISTS (SELECT 1 FROM '{dst}/orders.parquet' o "
        f"WHERE o.o_orderkey = l.l_orderkey)) "
        f"TO '{dst}/lineitem.parquet' (FORMAT PARQUET)")
    for t in ["region", "nation", "customer", "supplier", "part"]:
        out = f"{dst}/{t}.parquet"
        if os.path.exists(out):
            os.remove(out)
        os.link(f"{src}/{t}.parquet", out)
    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"]:
        n = con.execute(
            f"SELECT count(*) FROM '{dst}/{t}.parquet'").fetchone()[0]
        print(f"[sample] {t}: {n} rows")


if __name__ == "__main__":
    main()
