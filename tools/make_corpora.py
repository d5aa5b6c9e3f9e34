#!/usr/bin/env python3
"""Rebuild the standing sweep corpora from /root/testdata.

SURVEY.md §7.5 prescribes a per-round sweep over seven corpora: the three
driver SFs plus four derived ones that previous rounds built ad hoc in /tmp
(lost on every container swap). This script makes the derived four
reproducible:

  fuzz01  sf0.001 + NULL seeding and document edge cases: events.value NULL
          (event_id % 7 = 0), events.props NULL (% 11 = 0); documents text
          '' (doc_id % 13 = 0), whitespace-only (% 13 = 1), non-BMP emoji
          appended (% 13 = 2) — the NULL/empty/astral-plane vector.
  fuzz02  sf0.001 + the JSON props probe matrix spread across events
          (truncated/malformed/empty/string/float/bool/overflow-past-int64/json-null/
          NULL by event_id % 12; the overflow value stays INSIDE uint64 so
          DuckDB types it UBIGINT and renders the raw digits — a
          >uint64 int is DOUBLE-typed and re-rendered, the documented
          json_struct_extract oracle boundary) and ZERO-NORM embedding
          vectors
          (vec_id % 17 = 0) — the bare-int64 contract + IEEE-division
          vector.
  fuzz03  sf0.001 + events.value − 300 where event_id % 5 < 3 (~60% of rows
          negative) — the SIGN vector for every ratioRound/ratioScaled
          closure.
  sfx     sf0.1 inflated by key-offset replication so every size gate
          actually CROSSES (part ×540 and orders ×52, both UNCOMPRESSED,
          sized to pass the 256 MiB SinglePassBytes gate on the CURRENT
          corpus; lineitem ×10, events ×10,
          customer ×11, supplier ×10, embeddings ×30 with a per-replica
          first-dim perturbation — identical replicated vectors would plant
          duplicate k-means seeds, the round-14 lesson) plus 50 000
          synthesized documents with planted exact-dup and near-dup bands -
          spread over 50 sources with ~40-60-token texts: the within-source
          all-pairs oracles (ngram_jaccard/containment run at 50k docs,
          inside their 100k gate) cost sources * C(docs/source, 2) pairs
          in single-node DuckDB, and a 5-source long-doc layout made one
          oracle run for hours.

Oracles run over the SAME mutated files via tools/compare.py, so the corpora
only need self-consistency, not bit-identity with any historical build.

Usage: make_corpora.py [fuzz01|fuzz02|fuzz03|sfx|all] [outRoot=/tmp]
"""
import os, sys, shutil
import duckdb

TABLES = ["region", "nation", "supplier", "part", "customer", "orders",
          "lineitem", "events", "documents", "embeddings"]
SF0001 = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.1"


def copy_through(con, src, dst, skip):
    os.makedirs(dst, exist_ok=True)
    for t in TABLES:
        p = os.path.join(src, f"{t}.parquet")
        if t in skip or not os.path.exists(p):
            continue
        shutil.copy(p, os.path.join(dst, f"{t}.parquet"))


def write(con, sql, dst, table, compression=None):
    opts = "FORMAT PARQUET" + (
        f", COMPRESSION {compression}" if compression else "")
    con.execute(
        f"COPY ({sql}) TO '{os.path.join(dst, table + '.parquet')}' "
        f"({opts})")


def fuzz01(root):
    dst = os.path.join(root, "fuzz01")
    con = duckdb.connect()
    copy_through(con, SF0001, dst, {"events", "documents"})
    write(con, f"""
        SELECT event_id, ts, user_id, event_type,
          CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END AS "value",
          CASE WHEN event_id % 11 = 0 THEN NULL ELSE props END AS "props"
        FROM read_parquet('{SF0001}/events.parquet')""", dst, "events")
    write(con, f"""
        WITH m AS (SELECT doc_id,
            CASE WHEN doc_id % 13 = 0 THEN ''
                 WHEN doc_id % 13 = 1 THEN '   '
                 WHEN doc_id % 13 = 2 THEN text || ' \U0001F600\U0001F680'
                 ELSE text END AS "text",
            lang, source
          FROM read_parquet('{SF0001}/documents.parquet'))
        SELECT doc_id, text, lang, source,
          CAST(length(text) AS BIGINT) n_chars FROM m""", dst, "documents")
    print(f"built {dst}")


def fuzz02(root):
    dst = os.path.join(root, "fuzz02")
    con = duckdb.connect()
    copy_through(con, SF0001, dst, {"events", "embeddings"})
    write(con, f"""
        SELECT event_id, ts, user_id, event_type, value,
          CASE event_id % 15
            WHEN 0 THEN '{{'
            WHEN 1 THEN ''
            WHEN 2 THEN '{{"k": "str"}}'
            WHEN 3 THEN '{{"k": 3.7}}'
            WHEN 4 THEN '{{"k": true}}'
            WHEN 5 THEN '{{"k": 9999999999999999999}}'
            WHEN 6 THEN '{{"k": null}}'
            WHEN 7 THEN 'not json'
            WHEN 8 THEN NULL
            WHEN 9 THEN '{{"k":5'
            WHEN 10 THEN '{{"k":5}}x'
            WHEN 11 THEN '{{"k":5,"j":tru}}'
            ELSE props END AS "props"
        -- PLANTING DISCIPLINE (round-18 review): do NOT plant
        -- lenient-only JSON (trailing commas, bare inf/nan) or
        -- duplicate top-level keys in props — those are documented
        -- boundaries of the from_json SURFACE op json_struct_extract
        -- (Jackson rejects/last-wins where DuckDB accepts/first-wins,
        -- and no SQL gate can express the difference); the scalar
        -- JsonGetLong path handles them identically on both engines
        -- (battery-pinned in JsonGetLongSpec).
        FROM read_parquet('{SF0001}/events.parquet')""", dst, "events")
    write(con, f"""
        SELECT vec_id,
          CASE WHEN vec_id % 17 = 0
            THEN CAST(list_transform(embedding, x -> CAST(0.0 AS FLOAT))
                      AS FLOAT[])
            ELSE embedding END AS "embedding",
          label
        FROM read_parquet('{SF0001}/embeddings.parquet')""", dst,
        "embeddings")
    print(f"built {dst}")


def fuzz03(root):
    dst = os.path.join(root, "fuzz03")
    con = duckdb.connect()
    copy_through(con, SF0001, dst, {"events"})
    write(con, f"""
        SELECT event_id, ts, user_id, event_type,
          CASE WHEN event_id % 5 < 3 THEN value - 300 ELSE value END AS "value",
          props
        FROM read_parquet('{SF0001}/events.parquet')""", dst, "events")
    print(f"built {dst}")


def sfx(root):
    dst = os.path.join(root, "graft_sfx")
    con = duckdb.connect()
    copy_through(con, SF01, dst, {"part", "orders", "lineitem", "events",
                                  "customer", "supplier", "embeddings",
                                  "documents"})

    def rep(table, n, key_cols, extra="", compression=None, mod=None):
        src = f"{SF01}/{table}.parquet"
        offs = {k: con.execute(
            f"SELECT max({k}) + 1 FROM read_parquet('{src}')").fetchone()[0]
            for k in key_cols}
        cols = [r[0] for r in con.execute(
            f"DESCRIBE SELECT * FROM read_parquet('{src}')").fetchall()]
        # mod: per-column replica-index modulus so FK columns cycle within
        # a smaller replicated dimension (e.g. o_custkey over customer x11)
        sel = ", ".join(
            (f"{c} + (i % {mod[c]}) * {offs[c]} AS {c}"
             if mod and c in mod else
             f"{c} + i * {offs[c]} AS {c}") if c in key_cols else c
            for c in cols)
        sql = (f"SELECT {sel}{extra} FROM read_parquet('{src}'), "
               f"(SELECT unnest(range({n})) i)")
        write(con, sql, dst, table, compression)

    # Multipliers are sized to the CURRENT corpus so the 256 MiB
    # SinglePassBytes gates genuinely cross for orders and part (the
    # round-14 smoke's point); part/orders write UNCOMPRESSED because
    # replicated rows otherwise dictionary/zstd-compress far below the
    # gate. orders ×52 / lineitem ×10: replicas 10..51 have no lines.
    rep("supplier", 10, ["s_suppkey"])
    rep("part", 540, ["p_partkey"], compression="UNCOMPRESSED")
    rep("customer", 11, ["c_custkey"])
    rep("orders", 52, ["o_orderkey", "o_custkey"],
        compression="UNCOMPRESSED", mod={"o_custkey": 11})
    # lineitem key offsets must MATCH the orders/part/supplier replication
    # so FK edges survive
    o_off = con.execute(f"SELECT max(o_orderkey) + 1 FROM "
                        f"read_parquet('{SF01}/orders.parquet')").fetchone()[0]
    s_off = con.execute(f"SELECT max(s_suppkey) + 1 FROM "
                        f"read_parquet('{SF01}/supplier.parquet')").fetchone()[0]
    p_off = con.execute(f"SELECT max(p_partkey) + 1 FROM "
                        f"read_parquet('{SF01}/part.parquet')").fetchone()[0]
    write(con, f"""
        SELECT l_orderkey + i * {o_off} AS l_orderkey,
               l_partkey + (i % 10) * {p_off} AS l_partkey,
               l_suppkey + (i % 10) * {s_off} AS l_suppkey,
               l_linenumber, l_quantity, l_extendedprice, l_discount,
               l_tax, l_returnflag, l_linestatus, l_shipdate
        FROM read_parquet('{SF01}/lineitem.parquet'),
             (SELECT unnest(range(10)) i)""", dst, "lineitem")
    rep("events", 10, ["event_id", "user_id"])
    # embeddings ×30 with a per-replica first-dim nudge (distinct vectors)
    write(con, f"""
        SELECT vec_id + i * (SELECT max(vec_id) + 1
            FROM read_parquet('{SF01}/embeddings.parquet')) AS vec_id,
          CAST(list_concat(
            [CAST(embedding[1] + i * 0.001 AS FLOAT)],
            embedding[2:]) AS FLOAT[]) AS embedding,
          label
        FROM read_parquet('{SF01}/embeddings.parquet'),
             (SELECT unnest(range(30)) i)""", dst, "embeddings")
    # 50 000 synthesized documents: 5 sources; ids 0..49999. Bands:
    # id % 100 = 0..4 are EXACT duplicates of a shared band text;
    # id % 100 = 5..9 are NEAR duplicates (one token differs per id);
    # the rest are id-unique token streams.
    write(con, """
        WITH ids AS (SELECT unnest(range(50000)) id),
        t AS (SELECT id,
          CASE
            WHEN id % 100 < 5 THEN
              'band ' || CAST(id // 1000 AS VARCHAR) || ' ' ||
              list_aggregate(list_transform(range(60),
                x -> 'w' || CAST((id // 1000 * 7 + x * 13) % 997 AS VARCHAR)),
                'string_agg', ' ')
            WHEN id % 100 < 10 THEN
              'band ' || CAST(id // 1000 AS VARCHAR) || ' ' ||
              list_aggregate(list_transform(range(60),
                x -> CASE WHEN x = id % 100 THEN 'u' || CAST(id AS VARCHAR)
                     ELSE 'w' || CAST((id // 1000 * 7 + x * 13) % 997
                       AS VARCHAR) END),
                'string_agg', ' ')
            ELSE
              list_aggregate(list_transform(range(40),
                x -> 'v' || CAST((id * 31 + x * 17) % 99991 AS VARCHAR)),
                'string_agg', ' ')
          END AS "text"
          FROM ids)
        SELECT CAST(id AS BIGINT) doc_id, text, 'en' lang,
          'src' || CAST(id % 50 AS VARCHAR) source,
          CAST(length(text) AS BIGINT) n_chars
        FROM t""", dst, "documents")
    print(f"built {dst}")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    root = sys.argv[2] if len(sys.argv) > 2 else "/tmp"
    builders = {"fuzz01": fuzz01, "fuzz02": fuzz02, "fuzz03": fuzz03,
                "sfx": sfx}
    if which == "all":
        for b in builders.values():
            b(root)
    else:
        builders[which](root)
