#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>
         [--only=a,b] [--skip=a,b] [--timeout=SECS] [--fallback-sf=DIR]
(GRAFT_ORACLE_MEM overrides the 48GB DuckDB memory cap; per-query
verdicts stream to stderr so a crash keeps earlier evidence)

Budget guard: every oracle query runs under a per-query timeout
(default 900 s; a watchdog thread calls connection.interrupt()), so a
quadratic oracle formulation stalls ONE verdict, not the whole gate —
and the stall is a loud ORACLE_TIMEOUT failure, never a silent hang.
With --fallback-sf=DIR the timed-out oracle is re-run once against
the lower-SF tables and the verdict records whether the FORMULATION
completes there (evidence the oracle, not the Spark side, is the
bottleneck at gate SF). Fallback runs diagnose only — a timeout is
still a FAIL at the gate SF.

Reads each <verifyOutDir>/<name>/ parquet (Spark result), runs the
oracle SQL from <verifyOutDir>/oracle_sql.json against DuckDB views
over <sfDir>/*.parquet, and compares schema + values exactly
(order-sensitive AND as sorted multisets, columns sorted by name).
"""
import json, os, sys, glob, time, threading
import duckdb
import pandas as pd

DEFAULT_TIMEOUT = 900.0


class OracleTimeout(Exception):
    pass


def run_with_timeout(con, fn, timeout):
    """Run fn() (DuckDB work on `con`); interrupt it after `timeout`s.

    duckdb has no server-side statement timeout — the watchdog calls
    connection.interrupt(), which surfaces as duckdb.InterruptException
    in the executing thread; re-raise it as OracleTimeout so callers
    can tell a budget stop from a real oracle error."""
    timed_out = threading.Event()

    def stop():
        timed_out.set()
        try:
            con.interrupt()
        except Exception:
            pass
    timer = threading.Timer(timeout, stop)
    timer.start()
    try:
        out = fn()
        # Watchdog race: the timer may fire while fn() is in its
        # non-DuckDB tail (pandas compare) — the delivered interrupt
        # then sits unconsumed and would poison the NEXT query on this
        # connection with a spurious InterruptException. Treat a set
        # flag as the timeout it is; the caller rebuilds the session.
        if timed_out.is_set():
            raise OracleTimeout()
        return out
    except duckdb.Error as e:
        if timed_out.is_set():
            raise OracleTimeout() from e
        raise
    finally:
        timer.cancel()

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    return df

def fresh_con(sf_dir):
    con = duckdb.connect()
    # large-SF oracles need out-of-core operators: without a temp
    # directory an in-memory DuckDB cannot spill and one heavy query
    # OOMs the whole gate. The cap must leave headroom below the
    # BOX's memory: at 80GB one allocation spike killed the PROCESS
    # (unrecoverable, unlike the in-limit OutOfMemoryException that
    # the per-query rebuild handles), so default lower and make it
    # overridable.
    con.execute("SET temp_directory='/tmp/duckdb_spill'")
    con.execute("SET memory_limit='%s'"
                % os.environ.get("GRAFT_ORACLE_MEM", "48GB"))
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con

def main(sf_dir, out_dir, only=None, skip=None,
         timeout=DEFAULT_TIMEOUT, fallback_sf=None):
    con = fresh_con(sf_dir)
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    if only:
        oracle = {k: v for k, v in oracle.items() if k in only}
    if skip:
        oracle = {k: v for k, v in oracle.items() if k not in skip}
    results = {}

    def check(name, sql):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            return "NO_SPARK_OUTPUT"
        got = norm(con.execute(
            f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df())
        want = norm(con.execute(sql).df())
        if list(got.columns) != list(want.columns):
            return f"SCHEMA: spark={list(got.columns)} oracle={list(want.columns)}"
        note = ""
        if got.dtypes.astype(str).tolist() != want.dtypes.astype(str).tolist():
            # keep going; value compare may still pass
            note = (f"DTYPES: spark={got.dtypes.astype(str).tolist()} "
                    f"oracle={want.dtypes.astype(str).tolist()}")
        if len(got) != len(want):
            return f"ROWS: spark={len(got)} oracle={len(want)}"
        if got.equals(want):
            return note + " (values OK in-order)" if note else "OK"
        # order-insensitive compare
        g2 = got.sort_values(by=list(got.columns), ignore_index=True)
        w2 = want.sort_values(by=list(want.columns), ignore_index=True)
        if g2.equals(w2):
            return note + " ORDER_ONLY_MISMATCH"
        # find first differing cell
        diff_desc = []
        for c in got.columns:
            if not got[c].equals(want[c]):
                neq = (got[c] != want[c]) & ~(got[c].isna() & want[c].isna())
                idx = neq[neq].index[:3].tolist()
                for i in idx:
                    diff_desc.append(f"{c}[{i}]: spark={got[c][i]!r} oracle={want[c][i]!r}")
        return "VALUES: " + "; ".join(diff_desc[:6])

    def fallback_report(sql):
        """Re-run a timed-out oracle against the lower-SF tables:
        does the FORMULATION complete when the data shrinks?"""
        fcon = fresh_con(fallback_sf)
        try:
            t0 = time.time()
            run_with_timeout(fcon, lambda: fcon.execute(sql).df(), timeout)
            return f"; oracle completes in {time.time()-t0:.1f}s at {fallback_sf}"
        except OracleTimeout:
            return f"; oracle ALSO times out at {fallback_sf}"
        except Exception as e:
            return f"; fallback error at {fallback_sf}: {e}"
        finally:
            try:
                fcon.close()
            except Exception:
                pass

    for name in sorted(oracle):
        print(f"... {name}", file=sys.stderr, flush=True)
        t0 = time.time()
        try:
            results[name] = run_with_timeout(
                con, lambda: check(name, oracle[name]), timeout)
        except OracleTimeout:
            results[name] = f"ORACLE_TIMEOUT: >{timeout:.0f}s at gate SF"
            if fallback_sf:
                results[name] += fallback_report(oracle[name])
            # the interrupted session may hold a poisoned transaction;
            # rebuild like the error path
            try:
                con.close()
            except Exception:
                pass
            con = fresh_con(sf_dir)
        except Exception as e:
            results[name] = f"ORACLE_ERROR: {e}"
            # an OOM poisons the session; rebuild it so one heavy
            # oracle cannot cascade into every later comparison
            try:
                con.close()
            except Exception:
                pass
            con = fresh_con(sf_dir)
        # incremental verdict: a later crash must not erase earlier
        # evidence (an 80GB allocation spike once killed the process
        # with every finished comparison unprinted)
        print(f"[{time.time()-t0:7.1f}s] {name}: {results[name][:200]}",
              file=sys.stderr, flush=True)
    # rows-only queries (no oracle) — skipped under --only/--skip
    # (a filtered run would misread every unfiltered dump as rows-only)
    all_outs = set() if (only or skip) else {
        p.split("/")[-1] for p in glob.glob(f"{out_dir}/*")
        if "." not in p.split("/")[-1]}
    for name in sorted(all_outs - set(oracle)):
        n = con.execute(f"SELECT count(*) FROM read_parquet('{out_dir}/{name}/*.parquet')").fetchone()[0]
        results[name] = f"ROWS_ONLY: {n} rows" + ("" if n > 0 else "  <-- EMPTY, FAILS rows>0")
    ok = sum(1 for v in results.values() if v == "OK")
    for name, v in sorted(results.items()):
        mark = "PASS" if v == "OK" else ("rows" if v.startswith("ROWS_ONLY") and "EMPTY" not in v else "FAIL")
        print(f"[{mark}] {name}: {v}")
    print(f"\n{ok}/{len(oracle)} oracle-exact, {len(results)} total")

if __name__ == "__main__":
    only, skip, timeout, fallback_sf = None, None, DEFAULT_TIMEOUT, None
    for a in sys.argv[3:]:
        if a.startswith("--only="):
            only = set(a[len("--only="):].split(","))
        elif a.startswith("--skip="):
            skip = set(a[len("--skip="):].split(","))
        elif a.startswith("--timeout="):
            timeout = float(a[len("--timeout="):])
        elif a.startswith("--fallback-sf="):
            fallback_sf = a[len("--fallback-sf="):]
    main(sys.argv[1], sys.argv[2], only=only, skip=skip,
         timeout=timeout, fallback_sf=fallback_sf)
