#!/usr/bin/env python3
"""Fast syntax/binding lint for every gate's DuckDB oracle SQL.

Usage: lint_oracles.py <sfDir> [oracle_sql.json]

Without the second arg, dumps a fresh oracle_sql.json in ~15s by running
Verify with a match-nothing gate filter (Verify writes the FULL oracle map
regardless of the filter):

    sbt -batch 'runMain graft.Verify <sfDir> /tmp/lint_oracles NOMATCH^'

Then EXPLAINs every oracle statement against the registered table views —
catching typos, wrong column names, and DuckDB-dialect slips in seconds
instead of discovering them minutes into a full Verify+compare cycle.
EXPLAIN binds and plans but does not execute, so this lints cheaply even
for expensive oracles.

Dev tool only (driver-side python); never shipped with the library.
"""
import glob
import json
import os
import subprocess
import sys

import duckdb


def main() -> None:
    sf_dir = sys.argv[1]
    if len(sys.argv) > 2:
        path = sys.argv[2]
    else:
        try:
            subprocess.run(
                ["sbt", "-batch", "runMain graft.Verify " + sf_dir + " /tmp/lint_oracles NOMATCH^"],
                check=True, capture_output=True, text=True)
        except subprocess.CalledProcessError as e:
            # capture_output swallows sbt's streams; surface them or the
            # failure is opaque.
            print(e.stdout or "", file=sys.stderr)
            print(e.stderr or "", file=sys.stderr)
            raise
        path = "/tmp/lint_oracles/oracle_sql.json"
    oracle = json.load(open(path))
    con = duckdb.connect()
    for f in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.splitext(os.path.basename(f))[0]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{f}')")
    bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            con.execute("EXPLAIN " + sql)
        except Exception as e:
            bad += 1
            print(f"[FAIL] {name}: {str(e).splitlines()[0][:200]}")
    print(f"== {len(oracle) - bad}/{len(oracle)} oracles bind clean ==")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
