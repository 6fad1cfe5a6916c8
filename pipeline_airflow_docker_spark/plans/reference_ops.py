"""Reference-literal batch operators (SURVEY.md §2 Part A) as qkeys.

Every data operation the reference actually performs, re-expressed on
the driver's test tables so the DuckDB oracle can grade it. Each qkey
composes the reusable operators in ``..operators`` — the queries here
are the correctness harness; the operators are the product.

Determinism: the reference stamps wall-clock timestamps; qkeys derive
stamps from data (``doc_id``) instead so runs are replayable.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from pipeline_airflow_docker_spark.catalog import table
from pipeline_airflow_docker_spark.functions.materialize import scratch_mkdtemp
from pipeline_airflow_docker_spark.sources.scrape import STRIP_WS as _SCRAPE_STRIP_WS
from pipeline_airflow_docker_spark.operators import (
    drop_null_rows,
    enrich,
    nest_struct,
    require_keys,
    union_ragged,
)
from pipeline_airflow_docker_spark.operators.quality import count_gate
from pipeline_airflow_docker_spark.plans.registry import query

# Every graded "trim" is contracted to the reference's Python
# str.strip() char set (sources/scrape.py STRIP_WS): engine-default
# trims DIVERGE — Spark's trim() strips ASCII space only while
# DuckDB's also eats NBSP/Unicode spaces (found by fuzz axis 7, seed
# 13: q_project_upper split on a trailing \xa0). Both sides pass the
# set explicitly; the oracle side is chr() concatenation, not an
# E'..' literal, because DuckDB 1.0 escape strings know \xHH but not
# \uXXXX and raw control chars in SQL text are unreadable in logs.
_STRIP_WS_SQL = "(" + " || ".join(f"chr({ord(c)})" for c in _SCRAPE_STRIP_WS) + ")"
# Spark side: \uXXXX escapes in a SQL literal through the standard
# TRIM(BOTH .. FROM ..) syntax — the two-parameter F.trim(col, lit)
# signature is deprecated in Spark 4.1, and Spark's char() is mod-256
# so a chr() chain cannot spell code points past U+00FF (probed r12).
_STRIP_WS_SPARK = "'" + "".join(f"\\u{ord(c):04x}" for c in _SCRAPE_STRIP_WS) + "'"

# Epoch seconds of 2024-01-01T00:00:00Z — base for data-derived stamps.
_EPOCH_2024 = 1_704_067_200


# --------------------------------------------------------------------
# S2 CSV scan [ref dags/etl_data_pipeline.py:18] — parquet -> CSV ->
# typed read round-trip (header + explicit schema; inferSchema is the
# compat mode, not the default: at 100 TB inference is an extra pass).
# --------------------------------------------------------------------
@query("q_scan_csv", oracle="SELECT r_regionkey, r_name FROM region")
def q_scan_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    staging = os.path.join(scratch_mkdtemp("padspark_csv_"), "region_csv")
    table(spark, sf_dir, "region").write.mode("overwrite").option("header", True).csv(staging)
    return spark.read.option("header", True).schema("r_regionkey INT, r_name STRING").csv(staging)


# --------------------------------------------------------------------
# S3 JSON-records scan [ref dags/etl_data_pipeline_mongodb.py:35] —
# parquet -> JSONL -> typed read round-trip.
# --------------------------------------------------------------------
@query("q_scan_json", oracle="SELECT n_nationkey, n_name, n_regionkey FROM nation")
def q_scan_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    staging = os.path.join(scratch_mkdtemp("padspark_json_"), "nation_json")
    table(spark, sf_dir, "nation").write.mode("overwrite").json(staging)
    return spark.read.schema("n_nationkey INT, n_name STRING, n_regionkey INT").json(staging)


def _customer_with_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer with synthetic missing values (the driver tables are
    dense; the hw_200 fixture the reference cleans is not)."""
    c = table(spark, sf_dir, "customer")
    return c.withColumn(
        "c_acctbal",
        F.when(F.col("c_custkey") % 7 == 0, F.lit(None)).otherwise(F.col("c_acctbal")),
    ).withColumn(
        "c_name",
        F.when(F.col("c_custkey") % 11 == 0, F.lit(None)).otherwise(F.col("c_name")),
    )


_NULLED_CUSTOMER_SQL = """
  SELECT c_custkey,
         CASE WHEN c_custkey % 11 = 0 THEN NULL ELSE c_name END AS c_name,
         c_nationkey,
         CASE WHEN c_custkey % 7 = 0 THEN NULL ELSE c_acctbal END AS c_acctbal,
         c_mktsegment
  FROM customer
"""


# --------------------------------------------------------------------
# P1 dropna(any) [ref dags/etl_data_pipeline.py:23]
# --------------------------------------------------------------------
@query(
    "q_dropna_any",
    oracle=f"""
    -- dropna(any) drops on EVERY column (NaN counts as missing,
    -- pandas parity) — not just the two artificially nulled ones;
    -- natively-NULL c_mktsegment rows exposed the narrower filter
    -- (fuzz fixture, round 7)
    SELECT * FROM ({_NULLED_CUSTOMER_SQL})
    WHERE c_custkey IS NOT NULL AND c_name IS NOT NULL
      AND c_nationkey IS NOT NULL
      AND c_acctbal IS NOT NULL AND NOT isnan(c_acctbal)
      AND c_mktsegment IS NOT NULL
    """,
)
def q_dropna_any(spark: SparkSession, sf_dir: str) -> DataFrame:
    return drop_null_rows(_customer_with_nulls(spark, sf_dir), how="any")


# --------------------------------------------------------------------
# P-family extension: group-mean imputation — the clean-without-
# discarding counterpart to P1/P2 (the reference's only answer to a
# missing value is dropna). Nulled c_acctbal inherits its market
# segment's mean: one aggregate shuffle (order-independent decimal
# sums, functions/numeric.py::davg), stats broadcast back, the
# customer side never shuffles (operators/cleaning.py).
# --------------------------------------------------------------------
@query(
    "q_impute",
    oracle=f"""
    WITH n AS ({_NULLED_CUSTOMER_SQL}),
    s AS (
      SELECT c_mktsegment,
             CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS STRING) AS DOUBLE)
               / COUNT(c_acctbal) AS grp_mean
      FROM n GROUP BY c_mktsegment
    )
    SELECT n.c_custkey, n.c_mktsegment,
           COALESCE(n.c_acctbal, s.grp_mean) AS c_acctbal,
           (n.c_acctbal IS NULL) AS was_imputed
    FROM n LEFT JOIN s USING (c_mktsegment)
    """,
)
def q_impute(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pipeline_airflow_docker_spark.operators.cleaning import (  # noqa: PLC0415
        impute_group_mean,
    )

    nulled = _customer_with_nulls(spark, sf_dir).select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        # Flag from the ACTUAL pre-impute NULL, not the synthetic
        # nulling rule (c_custkey % 7): a row that arrives NULL from
        # the source must flag too.
        F.col("c_acctbal").isNull().alias("was_imputed"),
    )
    return impute_group_mean(nulled, ["c_mktsegment"], "c_acctbal").select(
        "c_custkey", "c_mktsegment", "c_acctbal", "was_imputed"
    )


# --------------------------------------------------------------------
# P2 dropna(all) [ref dags/etl_data_pipeline_mongodb_complex.py:40]
# --------------------------------------------------------------------
@query(
    "q_dropna_all",
    oracle="""
    SELECT c_name, c_acctbal FROM (
      SELECT CASE WHEN c_custkey % 13 = 0 THEN NULL ELSE c_name END AS c_name,
             CASE WHEN c_custkey % 13 = 0 OR c_custkey % 7 = 0 THEN NULL
                  ELSE c_acctbal END AS c_acctbal
      FROM customer
    ) WHERE c_name IS NOT NULL OR c_acctbal IS NOT NULL
    """,
)
def q_dropna_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer").select(
        F.when(F.col("c_custkey") % 13 == 0, F.lit(None))
        .otherwise(F.col("c_name"))
        .alias("c_name"),
        F.when((F.col("c_custkey") % 13 == 0) | (F.col("c_custkey") % 7 == 0), F.lit(None))
        .otherwise(F.col("c_acctbal"))
        .alias("c_acctbal"),
    )
    return drop_null_rows(c, how="all")


# --------------------------------------------------------------------
# P3+P10 project + upper + trim [ref dags/kafka_to_mongo_pipeline.py:76;
# dags/scrap_to_kafka_to_mongo_pipeline.py:59,108]
# --------------------------------------------------------------------
@query(
    "q_project_upper",
    oracle=f"SELECT doc_id, UPPER(TRIM(text, {_STRIP_WS_SQL})) AS title FROM documents",
)
def q_project_upper(spark: SparkSession, sf_dir: str) -> DataFrame:
    # trim is pinned to the STRIP_WS charset on BOTH sides (see
    # _STRIP_WS_SQL/_STRIP_WS_SPARK above): the reference's .strip()
    # is Python whitespace, and the engines' default trims disagree
    # about NBSP.
    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.upper(F.expr(f"trim(BOTH {_STRIP_WS_SPARK} FROM text)")).alias("title"),
    )


# --------------------------------------------------------------------
# P4 required-keys validation filter
# [ref dags/kafka_to_mongo_pipeline_enchanced.py:31-42]
# --------------------------------------------------------------------
@query(
    "q_filter_required",
    oracle="""
    SELECT * FROM (
      SELECT doc_id,
             CASE WHEN doc_id % 5 = 0 THEN NULL ELSE text END AS text,
             CASE WHEN doc_id % 3 = 0 THEN NULL ELSE lang END AS lang,
             source, n_chars
      FROM documents
    ) WHERE doc_id IS NOT NULL AND text IS NOT NULL AND lang IS NOT NULL
    """,
)
def q_filter_required(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    d = d.withColumn(
        "text", F.when(F.col("doc_id") % 5 == 0, F.lit(None)).otherwise(F.col("text"))
    ).withColumn(
        "lang", F.when(F.col("doc_id") % 3 == 0, F.lit(None)).otherwise(F.col("lang"))
    )
    return require_keys(d, ["doc_id", "text", "lang"])


# --------------------------------------------------------------------
# P5 record enrichment [ref dags/kafka_to_mongo_pipeline_enchanced.py:65-80]
# --------------------------------------------------------------------
@query(
    "q_enrich",
    oracle=f"""
    SELECT doc_id, text,
           strftime(to_timestamp({_EPOCH_2024} + doc_id), '%Y-%m-%dT%H:%M:%S')
             AS processed_timestamp,
           'jsonplaceholder_api' AS source,
           'raw' AS data_status
    FROM documents
    """,
)
def q_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents").select("doc_id", "text")
    stamp = F.timestamp_seconds(F.lit(_EPOCH_2024) + F.col("doc_id"))
    return enrich(d, source="jsonplaceholder_api", status="raw", ts=stamp)


# --------------------------------------------------------------------
# P6 nested wrap [ref pyc DAG data_pipeline_workflow, consts
# ('original_data','processed_at','status')] — struct serialized to
# JSON so the oracle comparison is format-stable.
# --------------------------------------------------------------------
@query(
    "q_nest_struct",
    oracle=f"""
    SELECT CAST(to_json(struct_pack(doc_id := doc_id, text := text,
                                    lang := lang)) AS VARCHAR)
             AS original_data_json,
           strftime(to_timestamp({_EPOCH_2024} + doc_id), '%Y-%m-%dT%H:%M:%S')
             AS processed_at,
           'processed' AS status
    FROM documents
    """,
)
def q_nest_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    stamp = F.timestamp_seconds(F.lit(_EPOCH_2024) + F.col("doc_id"))
    wrapped = nest_struct(d, wrapper="original_data", status="processed", ts=stamp)
    return wrapped.select(
        # ignoreNullFields=false: a NULL text must serialize as
        # "text":null, not vanish — the wrapped record's shape is part
        # of the contract (and DuckDB's to_json keeps null fields).
        F.to_json(
            F.col("original_data"), {"ignoreNullFields": "false"}
        ).alias("original_data_json"),
        "processed_at",
        "status",
    )


# --------------------------------------------------------------------
# P7 JSON serialize/deserialize round-trip [ref producer.py:8,
# consumer.py:17] over the events.props JSON column.
# --------------------------------------------------------------------
@query(
    "q_json_roundtrip",
    oracle="""
    SELECT event_id,
           CASE WHEN json_valid(props)
                     AND len(json_keys(props))
                         = len(list_distinct(json_keys(props)))
                     AND json_type(props, '$.k') IN ('BIGINT', 'UBIGINT')
                THEN TRY_CAST(json_extract(props, '$.k') AS INT) END AS k,
           -- from_json's degenerate ladder, mirrored exactly (probed):
           -- NULL/empty input -> NULL; malformed or missing/uncastable
           -- k -> '{}' (to_json drops null fields); valid int -> kv.
           -- Duplicate-key docs are ambiguous (struct assembly takes
           -- the LAST match, json_extract the FIRST — round-8 fuzz
           -- axis) and follow the malformed path: '{}'. The json_type
           -- gate mirrors Jackson's field coercion exactly: an INT
           -- struct field accepts only VALUE_NUMBER_INT tokens —
           -- string "8" and double 4.5/1e3 k's are NULL engine-side,
           -- where DuckDB's TRY_CAST would happily coerce them.
           CASE
             -- The ''-gate trims exactly JSON whitespace (space, tab,
             -- LF, CR): Jackson's tokenizer skips only those before
             -- deciding "no token -> NULL struct", so a '\t'-only doc
             -- is NULL engine-side while an NBSP-only doc is MALFORMED
             -- ('{}') — DuckDB's default trim() draws the line
             -- differently in BOTH directions (r12 probe, pinned in
             -- tests/test_cast_grammar.py).
             WHEN props IS NULL
                  OR trim(props, ' ' || chr(9) || chr(10) || chr(13)) = ''
               THEN NULL
             WHEN json_valid(props)
                  AND len(json_keys(props))
                      = len(list_distinct(json_keys(props)))
                  AND json_type(props, '$.k') IN ('BIGINT', 'UBIGINT')
                  AND TRY_CAST(json_extract(props, '$.k') AS INT) IS NOT NULL
               THEN '{"k":'
                    || CAST(TRY_CAST(json_extract(props, '$.k') AS INT) AS VARCHAR)
                    || '}'
             ELSE '{}'
           END AS value
    FROM events
    """,
)
def q_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Duplicate outer keys: Jackson's struct assembly silently keeps
    # the LAST occurrence — route those docs down the malformed path
    # (all-null struct -> '{}') instead, matching the oracle's
    # first-match-free contract. json_object_keys returns dups; it is
    # NULL for invalid/non-object docs, where from_json's own ladder
    # already matches the oracle (coalesce keeps those on that path).
    jok = F.json_object_keys("props")
    dup = F.coalesce(
        F.size(jok) != F.size(F.array_distinct(jok)), F.lit(False)
    )
    e = table(spark, sf_dir, "events").select(
        "event_id",
        F.when(~dup, F.from_json(F.col("props"), "k INT"))
        .otherwise(F.from_json(F.lit("{}"), "k INT"))
        .alias("r"),
    )
    return e.select(
        "event_id",
        F.col("r.k").alias("k"),
        F.to_json(F.col("r")).alias("value"),
    )


# --------------------------------------------------------------------
# P9 index/enumerate assignment [ref dags/scrap_to_kafka_to_mongo_pipeline.py:58]
# — deterministic: explicit total order (SURVEY.md §7 trap list).
# Since round 11 the global ROW_NUMBER is computed range-sharded
# (operators/splits.py::global_row_index): the naive global window
# funnels the whole table through ONE window partition — the last
# single-task sort in the graded registry. Identical values; the
# oracle keeps the textbook SQL form.
# --------------------------------------------------------------------
@query(
    "q_row_number",
    oracle="SELECT doc_id, CAST(ROW_NUMBER() OVER (ORDER BY doc_id) AS BIGINT) AS idx FROM documents",
)
def q_row_number(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pipeline_airflow_docker_spark.operators.splits import (  # noqa: PLC0415
        global_row_index,
    )

    d = table(spark, sf_dir, "documents").select("doc_id")
    return global_row_index(d, "doc_id", n_shards=32).select("doc_id", "idx")


# --------------------------------------------------------------------
# C1 ragged UNION ALL [ref dags/etl_data_pipeline_mongodb_complex.py:31]
# — zero-overlap schemas, missing cells -> null, left-then-right
# column order (pandas concat parity).
# --------------------------------------------------------------------
@query(
    "q_union_ragged",
    oracle="""
    SELECT r_regionkey AS region_key, r_name AS region_name,
           CAST(NULL AS VARCHAR) AS nation_name, CAST(NULL AS INTEGER) AS nation_key
    FROM region
    UNION ALL
    SELECT CAST(NULL AS INTEGER), CAST(NULL AS VARCHAR), n_name, n_nationkey
    FROM nation
    """,
)
def q_union_ragged(spark: SparkSession, sf_dir: str) -> DataFrame:
    left = table(spark, sf_dir, "region").select(
        F.col("r_regionkey").alias("region_key"), F.col("r_name").alias("region_name")
    )
    right = table(spark, sf_dir, "nation").select(
        F.col("n_name").alias("nation_name"), F.col("n_nationkey").alias("nation_key")
    )
    return union_ragged(left, right)


# --------------------------------------------------------------------
# G1-G4 count / gate / head / limit, consolidated into ONE graded key
# (round-3 window consolidation — three near-identical keys burned
# three of the driver's 50 graded slots):
#   G1 row count        [ref dags/etl_data_pipeline_mongodb_complex.py:43]
#   G2 count-threshold  [ref dags/etl_data_pipeline_mongodb_complex.py:57-62]
#   G3 head / preview   [ref dags/data_extraction.py:19]
#   G4 take-N limit     [ref dags/kafka_to_mongo_pipeline.py:69-80]
# One pipeline exercises all four: clean -> gate on count>10 (the
# "run" branch at sf>=0.01) -> total-ordered head-5, with the gate's
# count attached to every output row so G1's value is hash-checked
# too. Deterministic: limit only after a total order
# (TakeOrderedAndProject).
# --------------------------------------------------------------------
@query(
    "q_count_gate",
    oracle=f"""
    WITH cleaned AS (
      -- same all-column dropna(any) contract as q_dropna_any
      SELECT * FROM ({_NULLED_CUSTOMER_SQL})
      WHERE c_custkey IS NOT NULL AND c_name IS NOT NULL
        AND c_nationkey IS NOT NULL
        AND c_acctbal IS NOT NULL AND NOT isnan(c_acctbal)
        AND c_mktsegment IS NOT NULL
    )
    SELECT c_custkey, c_name, c_acctbal,
           (SELECT COUNT(*) FROM cleaned) AS n_rows
    FROM cleaned ORDER BY c_custkey LIMIT 5
    """,
)
def q_count_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    cleaned = drop_null_rows(_customer_with_nulls(spark, sf_dir), how="any")
    gated = count_gate(cleaned, min_rows=10)  # G2: driver-side branch
    n = gated.agg(F.count(F.lit(1)).alias("n_rows"))  # G1
    return (
        gated.select("c_custkey", "c_name", "c_acctbal")
        .orderBy("c_custkey")
        .limit(5)  # G3/G4
        .crossJoin(F.broadcast(n))
    )


# --------------------------------------------------------------------
# S5 scrape source as a graded qkey [ref dags/
# scrap_to_kafka_to_mongo_pipeline.py:40-79]: pages are synthesized
# in-plan from documents (an <h1> holding the first three tokens and
# two <a href> links derived from doc_id), then parsed back through
# the REAL scrape operator (stdlib html.parser inside an Arrow batch
# UDF). The oracle reconstructs the expected (type, index, content)
# rows directly from the synthesis rule, so the whole parse ->
# explode path is hash-checked without any network or fixture file.
#
# Round 12 deepening (the CSV-roundtrip method applied to the last
# parser boundary): doc_id % 8 picks a MALFORMATION CLASS for the
# page markup — every class is hostile HTML from the probe corpus
# (sources/scrape.py module contract), and classes 0-6 are
# output-NEUTRAL by contract (uppercase/unquoted/single-quoted/
# duplicate attrs, inline tags + comments inside h1, charref-encoded
# spaces, whitespace-heavy tags, self-closing links + script/CDATA
# decoys, h1 left open at EOF), so the oracle stays the clean 3-row
# shape for them; class 7 emits 12 links to hash-pin the first-10
# cap. Any parser regression on any class breaks hash parity on
# every sweep. The title strip mirrors Python str.strip() exactly
# (trim(x, STRIP_WS) in the oracle — plain trim() is space-only and
# diverges on \t/NBSP title edges; probe finding).
# --------------------------------------------------------------------
@query(
    "q_scrape",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, doc_id % 8 AS cls,
             trim(concat_ws(' ', toks[1], toks[2], toks[3]),
                  {_STRIP_WS_SQL}) AS title
      FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
      WHERE len(toks) >= 3
    )
    SELECT doc_id, 'title' AS type, 1 AS index, title AS content FROM t
    UNION ALL
    SELECT doc_id, 'link', 1, concat('https://ex.com/', doc_id, '/a')
    FROM t WHERE cls <> 7
    UNION ALL
    SELECT doc_id, 'link', 2, concat('https://ex.com/', doc_id, '/b')
    FROM t WHERE cls <> 7
    UNION ALL
    SELECT doc_id, 'link', CAST(i AS INT),
           concat('https://ex.com/', doc_id, '/l', i)
    FROM t, generate_series(1, 10) s(i) WHERE cls = 7
    """,
)
def q_scrape(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pipeline_airflow_docker_spark.sources.scrape import scrape_records  # noqa: PLC0415

    d = table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    title = F.concat_ws(
        " ", F.element_at(toks, 1), F.element_at(toks, 2), F.element_at(toks, 3)
    )
    # Escape the text before embedding it in markup (& first): a
    # document token like '<tag>' must arrive in the h1 as character
    # data, not as an HTML element — the scraper's charref conversion
    # then round-trips it back to the raw text the oracle sees
    # (unescaped embedding silently ate markup-like tokens; fuzz
    # fixture, round 7).
    title = F.replace(
        F.replace(
            F.replace(title, F.lit("&"), F.lit("&amp;")),
            F.lit("<"),
            F.lit("&lt;"),
        ),
        F.lit(">"),
        F.lit("&gt;"),
    )

    def url(suffix: str) -> Column:
        return F.concat(
            F.lit("https://ex.com/"), F.col("doc_id"), F.lit(suffix)
        )

    def page(*parts: Column | str) -> Column:
        return F.concat(*[F.lit(p) if isinstance(p, str) else p for p in parts])

    cls = F.col("doc_id") % 8
    html = (
        # c0: the clean baseline form.
        F.when(cls == 0, page(
            '<html><body><h1>', title, '</h1><a href="', url('/a'),
            '">x</a><a href="', url('/b'), '">y</a></body></html>',
        ))
        # c1: uppercase tags, unquoted attribute values.
        .when(cls == 1, page(
            "<HTML><BODY><H1>", title, "</H1><A HREF=", url("/a"),
            ">x</A><A HREF=", url("/b"), ">y</A></BODY></HTML>",
        ))
        # c2: single quotes, junk attrs, DUPLICATE href (first wins).
        .when(cls == 2, page(
            "<html><body><h1 class='hd' id=t>", title,
            "</h1><a rel='x' href='", url("/a"),
            "' href='https://WRONG/dup'>x</a><a href='", url("/b"),
            "' href=''>y</a></body></html>",
        ))
        # c3: title split across inline tags + a comment inside h1.
        .when(cls == 3, page(
            "<html><body><h1><b>", title,
            '</b><!-- decoy <a href="https://NO/comment"> --></h1>'
            '<a href="', url("/a"), '">x</a><a href="', url("/b"),
            '">y</a></body></html>',
        ))
        # c4: whitespace-heavy tags; spaces charref-coded as &#32;.
        .when(cls == 4, page(
            "<html><body><h1   >",
            F.replace(title, F.lit(" "), F.lit("&#32;")),
            '</h1  ><a\n  href = "', url("/a"), '" >x</a><a   href="',
            url("/b"), '"\t>y</a></body></html>',
        ))
        # c5: script/CDATA decoys, self-closing links, stray end tag.
        .when(cls == 5, page(
            "<html><body><script>var x = '<a href=\"https://NO/script\">';"
            "</script><h1>", title,
            '</h1><![CDATA[<a href="https://NO/cdata">]]><a href="',
            url("/a"), '"/><br><a href="', url("/b"),
            '"/></p></body></html>',
        ))
        # c6: h1 left OPEN at EOF (parser must flush; links precede).
        .when(cls == 6, page(
            '<html><body><a href="', url("/a"), '">x</a><a href="',
            url("/b"), '">y</a><h1>', title,
        ))
        # c7: 12 links — hash-pins the reference's first-10 cap.
        .otherwise(page(
            "<html><body><h1>", title, "</h1>",
            *[p for i in range(1, 13)
              for p in ('<a href="', url(f"/l{i}"), '">x</a>')],
            "</body></html>",
        ))
    )
    pages = d.filter(F.size(toks) >= 3).select("doc_id", html.alias("html"))
    return scrape_records(pages)


# --------------------------------------------------------------------
# P8 byte decode as a graded qkey [ref dags/kafka_to_mongo.py:18
# ``bytes.decode('utf-8')`` per message]: text -> binary -> cast back
# to string, the engine's whole-column decode of what the reference
# does per record. Length checks cover both representations.
# --------------------------------------------------------------------
@query(
    "q_byte_decode",
    oracle="""
    SELECT doc_id,
           text AS decoded,
           CAST(length(text) AS INT) AS n_chars,
           CAST(octet_length(encode(text)) AS INT) AS n_bytes
    FROM documents
    """,
)
def q_byte_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    payload = F.encode("text", "utf-8")
    return d.select(
        "doc_id",
        payload.cast("string").alias("decoded"),
        F.length(payload.cast("string")).cast("int").alias("n_chars"),
        F.octet_length(payload).cast("int").alias("n_bytes"),
    )


# --------------------------------------------------------------------
# G5 processed-items metrics as a graded qkey [ref
# dags/kafka_to_mongo_pipeline_enchanced.py:106,159 xcom_push of
# processed counts]: per-stage row counts of a clean -> validate ->
# dedup-exact pipeline emitted as a metrics TABLE — the engine-side
# form of the reference's XCom counters (computed from data, so
# replayable; the orchestration layer reads this table instead of
# driver-side state).
# --------------------------------------------------------------------
@query(
    "q_pipeline_metrics",
    oracle="""
    WITH raw AS (SELECT doc_id, text, lang FROM documents),
    validated AS (
      SELECT * FROM (
        SELECT doc_id,
               CASE WHEN doc_id % 5 = 0 THEN NULL ELSE text END AS text,
               CASE WHEN doc_id % 3 = 0 THEN NULL ELSE lang END AS lang
        FROM raw
      ) WHERE text IS NOT NULL AND lang IS NOT NULL
    ),
    deduped AS (SELECT MIN(doc_id) AS doc_id FROM validated GROUP BY text)
    SELECT 'raw' AS stage, COUNT(*) AS n_rows FROM raw
    UNION ALL SELECT 'validated', COUNT(*) FROM validated
    UNION ALL SELECT 'deduped', COUNT(*) FROM deduped
    """,
)
def q_pipeline_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    nulled = d.withColumn(
        "text", F.when(F.col("doc_id") % 5 == 0, F.lit(None)).otherwise(F.col("text"))
    ).withColumn(
        "lang", F.when(F.col("doc_id") % 3 == 0, F.lit(None)).otherwise(F.col("lang"))
    )
    validated = require_keys(nulled, ["text", "lang"])
    deduped = validated.groupBy("text").agg(F.min("doc_id").alias("doc_id"))

    def metric(stage: str, df: DataFrame) -> DataFrame:
        return df.agg(F.count(F.lit(1)).alias("n_rows")).select(
            F.lit(stage).alias("stage"), "n_rows"
        )

    return (
        metric("raw", d)
        .unionByName(metric("validated", validated))
        .unionByName(metric("deduped", deduped))
    )


# --------------------------------------------------------------------
# K6 JDBC replace as a graded qkey [ref dags/etl_data_pipeline.py:
# 32-34 ``to_sql(..., if_exists="replace")``]: region written to an
# embedded Derby database over real JDBC (executor-side batched
# inserts), then read back over JDBC — the write/read round-trip IS
# the graded result. Fresh database per invocation (Derby boots one
# instance per directory).
# --------------------------------------------------------------------
@query(
    "q_jdbc_roundtrip",
    oracle="SELECT r_regionkey, r_name FROM region",
)
def q_jdbc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pipeline_airflow_docker_spark.sinks.batch import write_jdbc_replace  # noqa: PLC0415

    url = f"jdbc:derby:{scratch_mkdtemp('padspark_jdbc_')}/db;create=true"
    props = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}
    write_jdbc_replace(
        table(spark, sf_dir, "region").select("r_regionkey", "r_name"),
        url,
        "region_t",
        props,
    )
    return (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", "region_t")
        .option("driver", props["driver"])
        .load()
        .select(F.col("r_regionkey").cast("int"), "r_name")
    )


# --------------------------------------------------------------------
# K-family extension: ORC round-trip, driver-graded. The round-2
# format matrix already shipped ORC read/write (sources/batch.py::
# read_orc, sinks/batch.py::write_orc) with pushdown tests; this key
# puts the pair under the oracle gate. Same in-plan round-trip shape
# as q_jdbc_roundtrip: write supplier to ORC (fresh scratch dir per
# invocation), read it back with a predicate + projection — graded
# against the parquet oracle, so the ORC writer/reader pair must
# round-trip values exactly. The filter and the 3-column ReadSchema
# reach the ORC scan (predicate pushdown / column pruning work for
# ORC like parquet; asserted in tests/test_plans.py).
# --------------------------------------------------------------------
@query(
    "q_orc_roundtrip",
    oracle="""
    SELECT s_suppkey, s_nationkey, s_name
    FROM supplier
    WHERE s_nationkey < 10
    """,
)
def q_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pipeline_airflow_docker_spark.sinks.batch import write_orc  # noqa: PLC0415
    from pipeline_airflow_docker_spark.sources.batch import read_orc  # noqa: PLC0415

    path = os.path.join(scratch_mkdtemp("padspark_orc_"), "supplier_orc")
    write_orc(
        table(spark, sf_dir, "supplier").select(
            "s_suppkey", "s_nationkey", "s_name", "s_acctbal"
        ),
        path,
    )
    return (
        read_orc(spark, path)
        .filter(F.col("s_nationkey") < 10)
        .select("s_suppkey", "s_nationkey", "s_name")
    )


# --------------------------------------------------------------------
# K1+S2 round-trip, driver-graded [ref dags/etl_data_pipeline.py:24
# ``to_csv(path, index=False)`` then :18 ``pd.read_csv``]: the
# DOCUMENTS table — the registry's full hostile-text surface (every
# fuzz axis: markup, unicode edges, embedded commas/quotes/newlines,
# whitespace, NULL vs '' — tools/gen_fuzz_data.py) — written to CSV
# (fresh scratch dir per invocation) and read back schema-first in the
# LOSSLESS dialect (sinks/batch.py:CSV_LOSSLESS_WRITE). The oracle
# carries the dialect's ONE documented collision: a literal '\N' text
# is indistinguishable from NULL on the wire. Integer/string columns
# only: CSV is textual, and grading float round-trips would test
# number formatting, not the sink (parquet/ORC/JDBC keys cover
# binary-exact values).
# --------------------------------------------------------------------
@query(
    "q_csv_roundtrip",
    oracle=r"""
    SELECT doc_id,
           CASE WHEN text = '\N' THEN NULL ELSE text END AS text,
           CASE WHEN lang = '\N' THEN NULL ELSE lang END AS lang,
           CASE WHEN source = '\N' THEN NULL ELSE source END AS source,
           n_chars
    FROM documents
    """,
)
def q_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pipeline_airflow_docker_spark.sinks.batch import write_csv  # noqa: PLC0415
    from pipeline_airflow_docker_spark.sources.batch import read_csv  # noqa: PLC0415

    path = os.path.join(scratch_mkdtemp("padspark_csv_"), "documents_csv")
    write_csv(
        table(spark, sf_dir, "documents").select(
            "doc_id", "text", "lang", "source", "n_chars"
        ),
        path,
        dialect="lossless",
    )
    return read_csv(
        spark,
        path,
        schema="doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT",
        dialect="lossless",
    )


# --------------------------------------------------------------------
# K2+S3 round-trip, driver-graded [ref dags/etl_data_pipeline_mongodb
# .py:24 ``to_json(orient="records")`` then :35 ``pd.read_json``]: the
# reference's JSON file hand-off as one oracle-checked unit,
# completing the graded sink matrix (CSV q_csv_roundtrip, ORC
# q_orc_roundtrip, JDBC q_jdbc_roundtrip, parquet shards
# tests/test_llm.py). Like q_csv_roundtrip it carries the DOCUMENTS
# table — the registry's full hostile-text surface — but JSONL needs
# no dialect and no oracle CASE: JSON escapes every probed string
# (newlines, NUL, astral, quotes, backslashes, multi-KB) and has a
# real null, so NULL vs '' survives the wire (round-11 probe; the CSV
# sentinel collision has no JSONL analog). Integer/string columns
# only — JSON is textual; float round-trips would grade number
# formatting, not the sink (the binary-exact formats cover values).
# --------------------------------------------------------------------
@query(
    "q_jsonl_roundtrip",
    oracle="SELECT doc_id, text, lang, source, n_chars FROM documents",
)
def q_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pipeline_airflow_docker_spark.sinks.batch import (  # noqa: PLC0415
        write_json_records,
    )
    from pipeline_airflow_docker_spark.sources.batch import (  # noqa: PLC0415
        read_json_records,
    )

    path = os.path.join(scratch_mkdtemp("padspark_jsonl_"), "documents_json")
    write_json_records(
        table(spark, sf_dir, "documents").select(
            "doc_id", "text", "lang", "source", "n_chars"
        ),
        path,
    )
    return read_json_records(
        spark,
        path,
        schema="doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT",
    )
