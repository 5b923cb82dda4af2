#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Runs each oracle SQL from <outDir>/oracle_sql.json in DuckDB against the
testdata parquet tables, reads the Spark result parquet from <outDir>/<name>
through pyarrow/pandas (the DRIVER'S read path — DuckDB would decode INT96
timestamps correctly and mask ns-overflow bugs the gate catches), sorts
columns by name then rows, and compares values exactly.

Usage: python3 tools/check.py <sfDir> <outDir>
"""
import glob
import json
import math
import sys

import duckdb
import pandas as pd
import pyarrow.parquet as pq

import datetime

def norm(v):
    # Spark DATE reads back as datetime.date; DuckDB's fetchdf returns the
    # same value as a midnight Timestamp. Normalize both to one repr (the
    # driver's hash compare is value-based and passes these).
    if isinstance(v, datetime.date) and not isinstance(v, datetime.datetime):
        return repr(pd.Timestamp(v))
    return repr(v)

def canon(rows):
    out = []
    for r in rows:
        out.append(tuple(norm(v) for v in r))
    return sorted(out)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            odf = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        try:
            parts = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
            if not parts:
                raise FileNotFoundError(f"{out_dir}/{name}/*.parquet")
            sdf = pd.concat(
                [pq.read_table(p).to_pandas() for p in parts],
                ignore_index=True)
        except Exception as e:
            print(f"FAIL {name}: spark output missing/unreadable: {e}")
            n_fail += 1
            continue
        ocols, scols = sorted(odf.columns), sorted(sdf.columns)
        if ocols != scols:
            print(f"FAIL {name}: columns differ\n  oracle: {ocols}\n  spark:  {scols}")
            n_fail += 1
            continue
        o = canon(odf[ocols].itertuples(index=False, name=None))
        s = canon(sdf[scols].itertuples(index=False, name=None))
        if len(o) != len(s):
            print(f"FAIL {name}: rowcount oracle={len(o)} spark={len(s)}")
            n_fail += 1
            continue
        if o != s:
            diffs = [(a, b) for a, b in zip(o, s) if a != b][:3]
            print(f"FAIL {name}: values differ; first diffs (oracle vs spark):")
            for a, b in diffs:
                print(f"   {a}\n   {b}")
            n_fail += 1
            continue
        print(f"PASS {name} ({len(o)} rows)")
        n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
