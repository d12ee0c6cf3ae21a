#!/usr/bin/env python3
"""Exercise compare.py's oracle budget guard with an intentionally
slow oracle.

Builds a fake verify dump whose single query has a tiny Spark-side
parquet but a quadratic oracle (cross-join max over lineitem²):
 - at the "gate" SF (sf0.01, 60k rows -> 3.6e9 pairs) the oracle must
   blow the 3 s budget and report ORACLE_TIMEOUT instead of hanging;
 - the --fallback-sf re-run at sf0.001 (6k rows -> 3.6e7 pairs) must
   complete, proving the report distinguishes "oracle formulation is
   quadratic" from "oracle is broken".

Run: python3 tools/test_compare_timeout.py   (exit 0 = pass)
"""
import json, os, subprocess, sys, tempfile

import duckdb

GATE_SF = "/root/testdata/sf0.01"
FALLBACK_SF = "/root/testdata/sf0.001"
SLOW_SQL = ("SELECT max(a.l_quantity + b.l_quantity) AS m "
            "FROM lineitem a, lineitem b")


def main():
    out = tempfile.mkdtemp(prefix="graft_cmp_timeout_")
    os.makedirs(f"{out}/slow_oracle")
    duckdb.connect().execute(
        "COPY (SELECT 1::DOUBLE AS m) TO "
        f"'{out}/slow_oracle/part-0.parquet' (FORMAT PARQUET)")
    with open(f"{out}/oracle_sql.json", "w") as f:
        json.dump({"slow_oracle": SLOW_SQL}, f)

    here = os.path.dirname(os.path.abspath(__file__))
    p = subprocess.run(
        [sys.executable, f"{here}/compare.py", GATE_SF, out,
         "--only=slow_oracle", "--timeout=3",
         f"--fallback-sf={FALLBACK_SF}"],
        capture_output=True, text=True, timeout=300)
    report = p.stdout + p.stderr
    ok = True
    if "ORACLE_TIMEOUT: >3s at gate SF" not in report:
        print("MISSING timeout verdict:\n" + report)
        ok = False
    if "oracle completes in" not in report:
        print("MISSING fallback-completes evidence:\n" + report)
        ok = False
    if "[FAIL] slow_oracle" not in report:
        print("timeout must surface as FAIL, not pass silently:\n" + report)
        ok = False
    print("PASS: budget guard traps the quadratic oracle" if ok else "FAIL")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
