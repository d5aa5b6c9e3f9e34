#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate.

Reads Verify's output dir (one parquet dir per query + oracle_sql.json),
runs each oracle in DuckDB against the same sf dir, and compares:
row count, column names (sorted), and exact values in row order.
Timestamps are normalized to naive UTC µs on both sides.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>
"""
import glob
import json
import sys

import duckdb
import pandas as pd


def load_spark(qdir):
    files = glob.glob(f"{qdir}/*.parquet")
    assert files, f"no parquet in {qdir}"
    return pd.read_parquet(files[0]) if len(files) == 1 else pd.concat(
        [pd.read_parquet(f) for f in sorted(files)])


def normalize(df):
    df = df[sorted(df.columns)].reset_index(drop=True)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            s = df[c]
            if getattr(s.dt, "tz", None) is not None:
                s = s.dt.tz_convert("UTC").dt.tz_localize(None)
            df[c] = s.astype("datetime64[us]")
    return df


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ["region", "nation", "supplier", "part", "customer", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        try:
            expected = normalize(con.execute(sql).fetchdf())
            actual = normalize(load_spark(f"{out_dir}/{name}"))
        except Exception as e:
            print(f"FAIL {name}: load/exec error: {e}")
            n_fail += 1
            continue
        status = []
        if list(expected.columns) != list(actual.columns):
            status.append(f"cols {list(expected.columns)} vs {list(actual.columns)}")
        elif len(expected) != len(actual):
            status.append(f"rows {len(expected)} vs {len(actual)}")
        else:
            for c in expected.columns:
                e, a = expected[c], actual[c]
                try:
                    same = (e.values == a.values) | (e.isna().values & a.isna().values)
                    ok = bool(same.all())
                except Exception:
                    ok = e.astype(str).equals(a.astype(str))
                if not ok:
                    bad = (~same).nonzero()[0][:3] if 'same' in dir() else []
                    detail = "; ".join(
                        f"row{i}: {e.iloc[i]!r} vs {a.iloc[i]!r}" for i in bad[:3])
                    status.append(f"col {c} ({e.dtype} vs {a.dtype}): {detail}")
        if status:
            print(f"FAIL {name}: " + " | ".join(status))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(expected)} rows)")
            n_pass += 1
    # rows-only queries (no oracle)
    for qdir in sorted(glob.glob(f"{out_dir}/*/")):
        name = qdir.rstrip("/").split("/")[-1]
        if name in oracle:
            continue
        try:
            n = len(load_spark(qdir))
            print(f"{'PASS' if n > 0 else 'FAIL'} {name} (rows-only: {n} rows)")
            n_pass += n > 0
            n_fail += n == 0
        except Exception as e:
            print(f"FAIL {name} (rows-only): {e}")
            n_fail += 1
    print(f"== {n_pass} pass / {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
