#!/usr/bin/env python3
"""Local replica of the driver's DuckDB correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Loads every parquet table in sfDir as a DuckDB view, runs each SQL from
<verifyOutDir>/oracle_sql.json, and compares to the engine's dumped
parquet result: same column set, same row multiset (columns sorted by
name, rows sorted, floats rounded to 6 significant-ish decimals).
"""
import json, sys, glob, os
import duckdb
import pandas as pd

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype.kind == "f":
            df[c] = df[c].round(6)
        elif str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            pass
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for p in glob.glob(f"{sf_dir}/*.parquet"):
        name = os.path.basename(p)[:-len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        res_dir = f"{out_dir}/{name}"
        if not os.path.isdir(res_dir):
            print(f"FAIL {name}: engine output missing")
            n_fail += 1
            continue
        try:
            got = canon(pd.read_parquet(res_dir))
            want = canon(con.execute(sql).df())
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
            n_fail += 1
        elif len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}")
            n_fail += 1
        else:
            # Dtype-kind strictness mirrors the driver's hash compare: an
            # int64 engine column vs a float64 oracle column (DuckDB HUGEINT
            # sums) hashes differently even when values are equal.
            kind_mismatch = [
                c for c in got.columns
                if {got[c].dtype.kind, want[c].dtype.kind} == {"i", "f"}
                or {got[c].dtype.kind, want[c].dtype.kind} == {"u", "f"}
            ]
            if kind_mismatch:
                print(f"FAIL {name}: dtype kind mismatch (int vs float) in {kind_mismatch}: "
                      f"{[(c, str(got[c].dtype), str(want[c].dtype)) for c in kind_mismatch]}")
                n_fail += 1
                continue
            try:
                pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                              check_exact=False, rtol=1e-6, atol=1e-6)
                print(f"PASS {name} ({len(got)} rows)")
                n_pass += 1
                continue
            except AssertionError as e:
                print(f"FAIL {name}: value mismatch: {str(e)[:300]}")
                n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
