#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (Spark result), runs the
oracle SQL from <verifyOutDir>/oracle_sql.json against DuckDB views
over <sfDir>/*.parquet, and compares schema + values exactly
(order-sensitive AND as sorted multisets, columns sorted by name).
"""
import json, sys, glob
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    return df

def fresh_con(sf_dir):
    con = duckdb.connect()
    # large-SF oracles need out-of-core operators: without a temp
    # directory an in-memory DuckDB cannot spill and one heavy query
    # OOMs the whole gate
    con.execute("SET temp_directory='/tmp/duckdb_spill'")
    con.execute("SET memory_limit='80GB'")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con

def main(sf_dir, out_dir):
    con = fresh_con(sf_dir)
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    for name in sorted(oracle):
        sql = oracle[name]
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            results[name] = "NO_SPARK_OUTPUT"
            continue
        print(f"... {name}", file=sys.stderr, flush=True)
        try:
            got = norm(con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df())
            want = norm(con.execute(sql).df())
        except Exception as e:
            results[name] = f"ORACLE_ERROR: {e}"
            # an OOM poisons the session; rebuild it so one heavy
            # oracle cannot cascade into every later comparison
            try:
                con.close()
            except Exception:
                pass
            con = fresh_con(sf_dir)
            continue
        if list(got.columns) != list(want.columns):
            results[name] = f"SCHEMA: spark={list(got.columns)} oracle={list(want.columns)}"
            continue
        if got.dtypes.astype(str).tolist() != want.dtypes.astype(str).tolist():
            results[name] = (f"DTYPES: spark={got.dtypes.astype(str).tolist()} "
                             f"oracle={want.dtypes.astype(str).tolist()}")
            # keep going; value compare may still pass
        if len(got) != len(want):
            results[name] = f"ROWS: spark={len(got)} oracle={len(want)}"
            continue
        if got.equals(want):
            results[name] = results.get(name, "OK")
            if results[name] != "OK":
                results[name] += " (values OK in-order)"
            continue
        # order-insensitive compare
        g2 = got.sort_values(by=list(got.columns), ignore_index=True)
        w2 = want.sort_values(by=list(want.columns), ignore_index=True)
        if g2.equals(w2):
            results[name] = results.get(name, "") + " ORDER_ONLY_MISMATCH"
            continue
        # find first differing cell
        diff_desc = []
        for c in got.columns:
            if not got[c].equals(want[c]):
                neq = (got[c] != want[c]) & ~(got[c].isna() & want[c].isna())
                idx = neq[neq].index[:3].tolist()
                for i in idx:
                    diff_desc.append(f"{c}[{i}]: spark={got[c][i]!r} oracle={want[c][i]!r}")
        results[name] = "VALUES: " + "; ".join(diff_desc[:6])
    # rows-only queries (no oracle)
    all_outs = {p.split("/")[-1] for p in glob.glob(f"{out_dir}/*") if "." not in p.split("/")[-1]}
    for name in sorted(all_outs - set(oracle)):
        n = con.execute(f"SELECT count(*) FROM read_parquet('{out_dir}/{name}/*.parquet')").fetchone()[0]
        results[name] = f"ROWS_ONLY: {n} rows" + ("" if n > 0 else "  <-- EMPTY, FAILS rows>0")
    ok = sum(1 for v in results.values() if v == "OK")
    for name, v in sorted(results.items()):
        mark = "PASS" if v == "OK" else ("rows" if v.startswith("ROWS_ONLY") and "EMPTY" not in v else "FAIL")
        print(f"[{mark}] {name}: {v}")
    print(f"\n{ok}/{len(oracle)} oracle-exact, {len(results)} total")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
