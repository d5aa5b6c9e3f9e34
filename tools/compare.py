#!/usr/bin/env python3
"""Local replica of the driver's DuckDB oracle compare.

Runs each oracle_sql.json statement in DuckDB against the sf parquet tables,
loads the corresponding Spark result parquet, sorts columns by name, and
compares row count, schema (column names), and a row-wise value hash.
Usage: compare.py <sfdir> <verify_outdir>
"""
import sys, os, json, glob, hashlib
import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

TABLES = ["region", "nation", "supplier", "part", "customer", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v, strict=True):
    # strict=True (the GATE since round 17): floats hash at FULL
    # precision (repr of the float64) — the round-14..16 lesson is that
    # the driver's comparator is stricter than ~6 sig figs (three
    # consecutive local "ALL PASS" sweeps green-lit a driver-red
    # text_js_divergence row), so the local gate must demand
    # bit-identical doubles, which is what every op's determinism
    # contract promises anyway. strict=False keeps the old ~6-sig-fig
    # hash purely as a diagnostic: "FAIL strict / PASS lenient" says
    # the values differ only in low-order float bits.
    import datetime
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return repr(float(v)) if strict else f"{v:.6g}"
    if hasattr(v, "to_pydatetime"):
        v = v.to_pydatetime()
    if isinstance(v, datetime.datetime) and v.time() == datetime.time(0):
        return v.date().isoformat()
    return str(v)

def table_hash(cols, rows, strict=True):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    h = hashlib.md5()
    for row in rows:
        h.update("|".join(norm(row[i], strict) for i in order).encode())
        h.update(b"\n")
    return h.hexdigest()

def driver_sortable(tbl, cols, name):
    """Mirror the driver comparator's pandas sort_values step: the driver
    sorts the Spark frame over all columns before hashing, and pandas'
    lexsort dies (Categorical → unhashable numpy.ndarray) on array-typed
    cells. Probing it here makes that shape fail LOCALLY (round-14
    streaming_topk escaped to the driver)."""
    import pandas as pd  # noqa: F401 — to_pandas needs it importable
    try:
        tbl.to_pandas().sort_values(by=list(cols))
        return True
    except Exception as e:
        print(f"{name}: FAIL driver-comparator cannot sort this shape: {e!r}")
        return False

def main(sfdir, outdir, only=None):
    con = duckdb.connect()
    con.execute("SET threads=4")
    for t in TABLES:
        p = os.path.join(sfdir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    if only:
        # mirror Verify's optional per-query filter (comma list) so a
        # single-op spot-check doesn't FAIL on the 170+ undumped queries.
        # A name with no oracle entry AND no dumped dir is a typo or a
        # never-registered query — erroring beats an empty ALL PASS that
        # green-lights a gate which checked nothing.
        keep = {s.strip() for s in only.split(",")}
        known = set(oracle) | {d for d in os.listdir(outdir)
                               if os.path.isdir(os.path.join(outdir, d))}
        unknown = keep - known
        if unknown:
            print(f"UNKNOWN QUERY NAME(S): {sorted(unknown)} — "
                  f"not in oracle_sql.json and nothing dumped")
            return 1
        oracle = {k: v for k, v in oracle.items() if k in keep}
    else:
        keep = None
    bad = 0
    for name, sql in sorted(oracle.items()):
        files = glob.glob(os.path.join(outdir, name, "*.parquet"))
        if not files:
            # Verify swallows per-query failures; surface them here as FAILs
            print(f"{name}: FAIL no spark output dumped")
            bad += 1
            continue
        # read EVERY part file — hashing only files[0] of a multi-part dump
        # would silently drop rows from the compare (round-4 verdict #4)
        spark_tbl = pa.concat_tables([pq.read_table(f) for f in sorted(files)])
        try:
            res = con.execute(sql)
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:
            print(f"{name}: ORACLE ERR {e}")
            bad += 1
            continue
        scols = spark_tbl.column_names
        if not driver_sortable(spark_tbl, scols, name):
            bad += 1
            continue
        srows = [tuple(r[c] for c in scols) for r in spark_tbl.to_pylist()]
        rows_ok = len(srows) == len(orows)
        schema_ok = sorted(scols) == sorted(ocols)
        hash_ok = table_hash(scols, srows) == table_hash(ocols, orows)
        status = "PASS" if (rows_ok and schema_ok and hash_ok) else "FAIL"
        if status == "FAIL":
            bad += 1
            lenient_ok = (rows_ok and schema_ok and
                          table_hash(scols, srows, strict=False)
                          == table_hash(ocols, orows, strict=False))
            hash_note = ("hash=False(strict) True(lenient~6sigfig)"
                         if lenient_ok else f"hash={hash_ok}")
            print(f"{name}: {status} rows={len(srows)}/{len(orows)} "
                  f"schema={schema_ok} ({sorted(scols)} vs {sorted(ocols)}) {hash_note}")
        else:
            print(f"{name}: PASS ({len(srows)} rows)")
    # no-oracle queries get a rows-only sanity check (driver records the same)
    for d in sorted(os.listdir(outdir)):
        sub = os.path.join(outdir, d)
        if not os.path.isdir(sub) or d in oracle or (keep is not None and d not in keep):
            continue
        files = glob.glob(os.path.join(sub, "*.parquet"))
        try:
            rows = sum(pq.read_table(f).num_rows for f in files) if files else -1
        except Exception:
            rows = -1
        if rows > 0:
            print(f"{d}: PASS-NOORACLE ({rows} rows)")
        else:
            print(f"{d}: FAIL no-oracle output missing or empty")
            bad += 1
    print(f"\n{'ALL PASS' if bad == 0 else f'{bad} FAILURES'}")
    return bad

if __name__ == "__main__":
    sys.exit(1 if main(sys.argv[1], sys.argv[2],
                       sys.argv[3] if len(sys.argv) > 3 else None) else 0)
