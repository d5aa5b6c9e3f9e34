#!/usr/bin/env python3
"""Measure DuckDB baseline timings for oracle queries (BASELINE.md method).

Methodology identical to BASELINE.md v1/v2: DuckDB 1.0.0, SET threads=4,
sf0.1 parquet views, warm cache (first run untimed), second run timed.
Usage: baseline.py <sfdir> <oracle_sql.json> [query ...]
With no query names, times every query in the json.
"""
import sys, os, json, time
import duckdb

TABLES = ["region", "nation", "supplier", "part", "customer", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main(sfdir, oracle_path, names):
    con = duckdb.connect()
    con.execute("SET threads=4")
    for t in TABLES:
        p = os.path.join(sfdir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(oracle_path))
    names = names or sorted(oracle)
    total = 0.0
    out = {}
    for name in names:
        sql = oracle[name]
        con.execute(sql).fetchall()          # warm: footers, cache
        t0 = time.perf_counter()
        con.execute(sql).fetchall()          # second run timed
        dt = time.perf_counter() - t0
        out[name] = round(dt, 4)
        total += dt
        print(f"{name}: {dt:.4f} s")
    print(f"total ({len(names)} queries): {total:.4f} s")
    json.dump(out, open("baseline_new.json", "w"), indent=1)

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], sys.argv[3:])
