#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB oracle check.

Usage: python3 scripts/check_correctness.py <sfDir> <verifyOutDir>

<verifyOutDir> is the output of `sbt "runMain graft.Verify <sfDir> <out>"`:
one parquet dir per query plus oracle_sql.json. For every query with an
oracle, runs the SQL against views over the sf tables (+ the aux dumps the
SQL references directly) and compares the result to the engine's parquet as
an exact multiset (EXCEPT ALL both ways + row counts). Queries without an
oracle are reported rows-only.
"""
import json
import os
import sys

import duckdb

def main() -> int:
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in os.listdir(sf_dir):
        if t.endswith(".parquet"):
            name = t[: -len(".parquet")]
            con.execute(
                f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{sf_dir}/{t}/*.parquet')"
                if os.path.isdir(os.path.join(sf_dir, t))
                else f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{sf_dir}/{t}')"
            )
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    failures = 0
    for q in sorted(os.listdir(out_dir)):
        qdir = os.path.join(out_dir, q)
        if not os.path.isdir(qdir):
            continue
        spark_rel = f"SELECT * FROM read_parquet('{qdir}/*.parquet')"
        n_spark = con.execute(f"SELECT count(*) FROM ({spark_rel})").fetchone()[0]
        if q not in oracles:
            print(f"{q:26s} rows-only: {n_spark} rows")
            continue
        sql = oracles[q]
        try:
            n_oracle = con.execute(f"SELECT count(*) FROM ({sql})").fetchone()[0]
            a = con.execute(f"SELECT count(*) FROM (({sql}) EXCEPT ALL ({spark_rel}))").fetchone()[0]
            b = con.execute(f"SELECT count(*) FROM (({spark_rel}) EXCEPT ALL ({sql}))").fetchone()[0]
            ok = n_spark == n_oracle and a == 0 and b == 0
            print(f"{q:26s} {'PASS' if ok else 'FAIL'} rows={n_spark}/{n_oracle} diff={a}+{b}")
            if not ok:
                failures += 1
        except Exception as e:  # noqa: BLE001
            print(f"{q:26s} ERROR {e}")
            failures += 1
    print("FAILURES:", failures)
    return 1 if failures else 0

if __name__ == "__main__":
    sys.exit(main())
