"""Degenerate-data variant of a testdata dir — the adversarial parity
fixture.

Real 100 TB corpora are full of garbage rows: NULL documents, empty
strings, whitespace-only text, malformed JSON, NULL measures, zero
vectors. The driver's correctness gate only ever grades clean sf0.01
data, so a whole class of cross-engine cliffs (NULL propagation,
empty-array semantics, divide-by-zero) stays invisible until an
advisor or a production corpus finds it — round 5 found three such
defects by hand (NULL-text LSH collapse, simhash row drops, constant
shingle sets). This tool mechanizes that hunt:

    python tools/gen_degenerate_data.py            # -> .benchdata/degen
    python tools/check_parity.py --sf /root/repo/.benchdata/degen

Every table is the sf0.001 base PLUS a block of hand-written
degenerate rows (ids >= 900001 so they never collide): NULL/empty/
whitespace/unicode text, exact-duplicate docs, NULL measures and
group keys, malformed and NULL JSON props, orphan foreign keys, NULL/
empty/zero embedding vectors. Timestamp and primary-key columns stay
NOT NULL — that is the engine's declared ingest contract (S6-S8 parse
with explicit schemas; a NULL event time is dropped at the
tolerant-cast quarantine, B44, before reaching windowed operators).

tests/test_degenerate_parity.py runs a representative key subset per
family through the full Spark-vs-DuckDB comparison on this fixture;
the full 150-key sweep is a round ritual (NOTES_r05).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from pipeline_airflow_docker_spark.catalog import TABLES  # noqa: E402

BASE_ID = 900_000

# Per-table degenerate blocks as DuckDB SELECT literals UNIONed onto
# the base parquet. Columns must match the base schema exactly (types
# asserted after write).
DEGENERATE_SQL: dict[str, str] = {
    "region": None,  # dims stay untouched: bounded blast radius
    "nation": None,
    "customer": f"""
        SELECT * FROM (VALUES
          ({BASE_ID + 1}::BIGINT, NULL::VARCHAR, 0::INTEGER, NULL::DOUBLE, NULL::VARCHAR),
          ({BASE_ID + 2}::BIGINT, ''::VARCHAR, 1::INTEGER, -0.0::DOUBLE, ''::VARCHAR),
          ({BASE_ID + 3}::BIGINT, 'Müller 顧客 🙂'::VARCHAR, 2::INTEGER, 0.0::DOUBLE, 'BUILDING'::VARCHAR),
          ({BASE_ID + 4}::BIGINT, 'dup name'::VARCHAR, 3::INTEGER, 1234.56::DOUBLE, 'AUTOMOBILE'::VARCHAR),
          ({BASE_ID + 5}::BIGINT, 'dup name'::VARCHAR, 3::INTEGER, 1234.56::DOUBLE, 'AUTOMOBILE'::VARCHAR)
        ) t(c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment)
    """,
    "supplier": f"""
        SELECT * FROM (VALUES
          ({BASE_ID + 1}::BIGINT, NULL::VARCHAR, 0::INTEGER, NULL::DOUBLE),
          ({BASE_ID + 2}::BIGINT, ''::VARCHAR, 24::INTEGER, 0.0::DOUBLE)
        ) t(s_suppkey, s_name, s_nationkey, s_acctbal)
    """,
    "part": f"""
        SELECT * FROM (VALUES
          ({BASE_ID + 1}::BIGINT, NULL::VARCHAR, NULL::VARCHAR, NULL::VARCHAR, NULL::INTEGER, NULL::DOUBLE),
          ({BASE_ID + 2}::BIGINT, ''::VARCHAR, 'Brand#0'::VARCHAR, ''::VARCHAR, 0::INTEGER, 0.0::DOUBLE)
        ) t(p_partkey, p_name, p_brand, p_type, p_size, p_retailprice)
    """,
    "orders": f"""
        SELECT * FROM (VALUES
          ({BASE_ID + 1}::BIGINT, {BASE_ID + 1}::BIGINT, NULL::VARCHAR, NULL::DOUBLE,
           TIMESTAMP '1998-06-15 00:00:00', NULL::VARCHAR),
          ({BASE_ID + 2}::BIGINT, 999999999::BIGINT, 'F'::VARCHAR, 0.0::DOUBLE,
           TIMESTAMP '1997-03-01 00:00:00', '1-URGENT'::VARCHAR)
        ) t(o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority)
    """,
    "lineitem": f"""
        SELECT * FROM (VALUES
          ({BASE_ID + 1}::BIGINT, {BASE_ID + 1}::BIGINT, {BASE_ID + 1}::BIGINT, 1::INTEGER,
           NULL::DOUBLE, NULL::DOUBLE, NULL::DOUBLE, NULL::DOUBLE,
           NULL::VARCHAR, NULL::VARCHAR, TIMESTAMP '1998-07-01 00:00:00'),
          ({BASE_ID + 1}::BIGINT, 1::BIGINT, 1::BIGINT, 2::INTEGER,
           0.0::DOUBLE, 0.0::DOUBLE, 0.0::DOUBLE, 0.0::DOUBLE,
           'N'::VARCHAR, 'O'::VARCHAR, TIMESTAMP '1998-07-02 00:00:00'),
          (999999998::BIGINT, 999999998::BIGINT, 999999998::BIGINT, 1::INTEGER,
           1.0::DOUBLE, 1.0::DOUBLE, 0.0::DOUBLE, 0.0::DOUBLE,
           'R'::VARCHAR, 'F'::VARCHAR, TIMESTAMP '1996-01-01 00:00:00')
        ) t(l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity,
            l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate)
    """,
    "events": f"""
        SELECT * FROM (VALUES
          ({BASE_ID + 1}::BIGINT, TIMESTAMP '2024-01-15 12:00:00', {BASE_ID + 1}::BIGINT,
           NULL::VARCHAR, NULL::DOUBLE, NULL::VARCHAR),
          ({BASE_ID + 2}::BIGINT, TIMESTAMP '2024-01-15 12:00:01', {BASE_ID + 1}::BIGINT,
           'click'::VARCHAR, NULL::DOUBLE, '{{}}'::VARCHAR),
          ({BASE_ID + 3}::BIGINT, TIMESTAMP '2024-01-15 12:00:02', NULL::BIGINT,
           'view'::VARCHAR, 0.0::DOUBLE, 'not json at all'::VARCHAR),
          ({BASE_ID + 4}::BIGINT, TIMESTAMP '2024-01-15 12:00:03', {BASE_ID + 2}::BIGINT,
           ''::VARCHAR, -0.0::DOUBLE, ''::VARCHAR),
          ({BASE_ID + 5}::BIGINT, TIMESTAMP '2024-01-15 12:00:04', {BASE_ID + 2}::BIGINT,
           'purchase'::VARCHAR, 42.5::DOUBLE, '{{"k": "notanint"}}'::VARCHAR),
          -- whitespace-only props straddle from_json's NULL-vs-malformed
          -- line (r12 probe): JSON-ws-only (tab) -> NULL struct, non-JSON
          -- ws (NBSP) -> malformed '{{}}' — the oracle ''-gate must trim
          -- exactly {{space, \\t, \\n, \\r}} to agree in both directions
          ({BASE_ID + 6}::BIGINT, TIMESTAMP '2024-01-15 12:00:05', {BASE_ID + 2}::BIGINT,
           'click'::VARCHAR, 1.0::DOUBLE, chr(9)::VARCHAR),
          ({BASE_ID + 7}::BIGINT, TIMESTAMP '2024-01-15 12:00:06', {BASE_ID + 2}::BIGINT,
           'click'::VARCHAR, 1.0::DOUBLE, chr(160)::VARCHAR)
        ) t(event_id, ts, user_id, event_type, value, props)
    """,
    "documents": f"""
        SELECT * FROM (VALUES
          ({BASE_ID + 1}::BIGINT, NULL::VARCHAR, 'en'::VARCHAR, 'src0'::VARCHAR, NULL::BIGINT),
          ({BASE_ID + 2}::BIGINT, ''::VARCHAR, 'en'::VARCHAR, 'src1'::VARCHAR, 0::BIGINT),
          ({BASE_ID + 3}::BIGINT, '   '::VARCHAR, NULL::VARCHAR, 'src2'::VARCHAR, 3::BIGINT),
          ({BASE_ID + 4}::BIGINT, 'solo'::VARCHAR, 'xx'::VARCHAR, NULL::VARCHAR, 4::BIGINT),
          ({BASE_ID + 5}::BIGINT, 'дубль 重复 🙂 café café naïve'::VARCHAR, 'zz'::VARCHAR, 'src3'::VARCHAR, 27::BIGINT),
          ({BASE_ID + 6}::BIGINT, NULL::VARCHAR, NULL::VARCHAR, NULL::VARCHAR, NULL::BIGINT),
          ({BASE_ID + 7}::BIGINT, 'tok tok tok tok tok tok tok tok tok tok'::VARCHAR, 'en'::VARCHAR, 'src4'::VARCHAR, 39::BIGINT),
          ({BASE_ID + 8}::BIGINT, 'an exact duplicate text body here'::VARCHAR, 'en'::VARCHAR, 'src5'::VARCHAR, 33::BIGINT),
          ({BASE_ID + 9}::BIGINT, 'an exact duplicate text body here'::VARCHAR, 'en'::VARCHAR, 'src6'::VARCHAR, 33::BIGINT)
        ) t(doc_id, text, lang, source, n_chars)
    """,
    # 64-dim embedding column. Zero vector: cosine denominators vanish
    # — both engines must agree on the (documented) NULL/NaN outcome.
    "embeddings": f"""
        SELECT * FROM (VALUES
          ({BASE_ID + 1}::BIGINT, NULL, NULL::INTEGER),
          ({BASE_ID + 2}::BIGINT, []::FLOAT[], 0::INTEGER),
          ({BASE_ID + 3}::BIGINT, CAST(list_transform(range(64), x -> 0.0) AS FLOAT[]), 1::INTEGER)
        ) t(vec_id, embedding, label)
    """,
}

def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default="/root/testdata/sf0.001")
    ap.add_argument("--out", default="/root/repo/.benchdata/degen")
    ap.add_argument(
        "--mode",
        choices=("degen", "empty"),
        default="degen",
        help="degen = base + adversarial rows; empty = every table at "
        "ZERO rows (the pipeline-first-run state — zero-row edges: "
        "grouping-sets grand totals, min/max-anchored choreography)",
    )
    args = ap.parse_args()

    os.makedirs(args.out, exist_ok=True)
    con = duckdb.connect()
    for t in TABLES:
        base = f"SELECT * FROM read_parquet('{args.base}/{t}.parquet')"
        if args.mode == "empty":
            sql = f"{base} LIMIT 0"
        else:
            extra = DEGENERATE_SQL.get(t)
            sql = base if extra is None else f"{base} UNION ALL {extra}"
        out_path = os.path.join(args.out, f"{t}.parquet")
        con.execute(f"COPY ({sql}) TO '{out_path}' (FORMAT PARQUET)")
        # Type fidelity: the degenerate block must not widen any column.
        bt = con.sql(base).types
        ot = con.sql(f"SELECT * FROM read_parquet('{out_path}')").types
        assert [str(x) for x in bt] == [str(x) for x in ot], (
            t, [str(x) for x in bt], [str(x) for x in ot],
        )
        n = con.sql(f"SELECT count(*) FROM read_parquet('{out_path}')").fetchone()[0]
        print(f"{t}: {n} rows -> {out_path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
