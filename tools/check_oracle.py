#!/usr/bin/env python3
"""Dev-only oracle check loop (mimics the driver's CORRECTNESS gate).

Reads the Verify output dir (parquet per query + oracle_sql.json), runs each
oracle SQL in DuckDB over the same sf parquet tables, and compares:
  - schema: sorted column names equal
  - rows:   multiset of rows equal, columns sorted by name, values stringified
This is a strict superset of any reasonable hash-compare; if this passes, the
driver's gate should too. NOT part of the shipped library (driver-side python).

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import json, math, sys
from collections import Counter

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon_val(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # full precision; bit-exact match required
    if isinstance(v, bool):
        return "true" if v else "false"
    return str(v)


def canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    scols = [cols[i] for i in order]
    srows = Counter(tuple(canon_val(r[i]) for i in order) for r in rows)
    return scols, srows


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            gcols = [d[0] for d in got.description]
            grows = got.fetchall()
        except Exception as e:
            print(f"FAIL {name}: spark output unreadable: {e}")
            n_bad += 1
            continue
        try:
            exp = con.execute(sql)
            ecols = [d[0] for d in exp.description]
            erows = exp.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            n_bad += 1
            continue
        gc, gr = canon(gcols, grows)
        ec, er = canon(ecols, erows)
        if gc != ec:
            print(f"FAIL {name}: schema {gc} != {ec}")
            n_bad += 1
        elif gr != er:
            only_g = list((gr - er).items())[:3]
            only_e = list((er - gr).items())[:3]
            print(f"FAIL {name}: rows differ (spark={sum(gr.values())} duck={sum(er.values())})")
            print(f"  spark-only: {only_g}")
            print(f"  duck-only:  {only_e}")
            n_bad += 1
        else:
            print(f"ok   {name} ({sum(gr.values())} rows)")
            n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} failed")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
