#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: check_correctness.py <sfDir> <verifyOutDir>

Registers every <sfDir>/<table>.parquet as a DuckDB view, runs each entry of
<verifyOutDir>/oracle_sql.json, and compares against the Spark parquet dump at
<verifyOutDir>/<name>/ — columns sorted by name, rows sorted, values
stringified (floats rounded to 9 significant-ish decimals, timestamps to
microseconds) — then prints per-query match/mismatch.

Dev tool only (driver-side python); never shipped with the library.
"""
import sys, os, json, glob, hashlib
import duckdb
import pyarrow.parquet as pq
import pandas as pd


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)

    def cell(v):
        if v is None or v is pd.NaT:
            return "NULL"
        if isinstance(v, float):
            if pd.isna(v):
                return "NULL"
            return repr(round(v, 9))
        if isinstance(v, pd.Timestamp):
            return v.floor("us").isoformat()
        if isinstance(v, bytes):
            return v.hex()
        if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
            return "[" + ",".join(cell(x) for x in v) + "]"
        return str(v)

    out = df.apply(lambda c: c.map(cell))
    out = out.sort_values(by=list(out.columns), kind="mergesort").reset_index(drop=True)
    return out


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for f in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.splitext(os.path.basename(f))[0]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{f}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    results = {}
    for name, sql in sorted(oracle.items()):
        spark_path = os.path.join(out_dir, name)
        try:
            sdf = pq.read_table(glob.glob(spark_path + "/*.parquet")[0] if glob.glob(spark_path + "/*.parquet") else spark_path).to_pandas()
        except Exception as e:
            results[name] = f"SPARK-MISSING ({e})"
            continue
        try:
            odf = con.execute(sql).df()
        except Exception as e:
            results[name] = f"ORACLE-ERROR ({str(e).splitlines()[0][:160]})"
            continue
        cs, co = canon(sdf), canon(odf)
        if list(cs.columns) != list(co.columns):
            results[name] = f"SCHEMA-MISMATCH spark={list(cs.columns)} oracle={list(co.columns)}"
            continue
        if len(cs) != len(co):
            results[name] = f"ROWCOUNT-MISMATCH spark={len(cs)} oracle={len(co)}"
            continue
        hs = hashlib.sha256(cs.to_csv(index=False).encode()).hexdigest()
        ho = hashlib.sha256(co.to_csv(index=False).encode()).hexdigest()
        if hs == ho:
            results[name] = f"OK ({len(cs)} rows)"
        else:
            diff = (cs != co)
            bad_cols = [c for c in cs.columns if diff[c].any()]
            idx = diff.any(axis=1)
            ex = pd.concat([cs[idx].head(3).add_suffix("_spark"), co[idx].head(3).add_suffix("_oracle")], axis=1)
            results[name] = f"VALUE-MISMATCH cols={bad_cols}\n{ex.to_string()}"
    ok = sum(1 for v in results.values() if v.startswith("OK"))
    for k, v in results.items():
        flag = "PASS" if v.startswith("OK") else "FAIL"
        print(f"[{flag}] {k}: {v}")
    print(f"== {ok}/{len(results)} queries match ==")
    sys.exit(0 if ok == len(results) else 1)


if __name__ == "__main__":
    main()
