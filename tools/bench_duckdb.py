#!/usr/bin/env python3
"""Dev-only comparison: time each oracle SQL in DuckDB (the reference's
engine) over the same sf parquet the Spark bench uses, for the
matches-or-beats single-node-throughput comparison in BASELINE.md.

Usage: python3 tools/bench_duckdb.py <sfDir> <verifyOutDir-with-oracle_sql.json>
"""
import json, sys, time

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def main(sf_dir, out_dir):
    con = duckdb.connect()
    con.execute("SET threads TO 16")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    times = {}
    for name, sql in sorted(oracle.items()):
        t0 = time.time()
        try:
            con.execute(sql).fetchall()
            times[name] = round(time.time() - t0, 3)
        except Exception as e:
            times[name] = -1.0
            print(f"# {name} failed: {e}", file=sys.stderr)
    total = sum(v for v in times.values() if v > 0)
    print(json.dumps({"metric": "duckdb_total", "value": round(total, 2),
                      "unit": "sec", "queries": times, "sf": sf_dir}))


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
