"""Round-5 staged qkeys — registered into the graded registry only
once CORRECTNESS_r04.json exists.

Why staged: the driver grades a 50-key window per round, ordered by
evidence staleness (plans/__init__.py::_rotate). Entering round 4 the
registry holds 141 keys and the window is EXACTLY consumed by the 44
never-driver-green keys plus the 6 round-1-stale keys; a key added in
round 4 would sort ahead of those 6 (never-green beats age-2) and push
them to age 3, breaking the freshness invariant NOTES_r04.md pins. So
these nine register through :data:`STAGED_QUERIES` /
:data:`STAGED_ORACLES`, which plans/__init__.py merges in only when
the driver's round counter reaches 4 (i.e. from the round-5 session
on) — they then front the round-5 window as never-green keys, and at
150 total the ceil(150/50)=3-round regrade cycle still holds max-age 2
for every key. Until then the parity gate covers them:
``SPARK_GRAFT_STAGED=1 python tools/check_parity.py`` and
tests/test_staged_r5.py grade all nine against the same DuckDB oracles.

Operators covered (SURVEY.md §2): B46 mode/median summary, B47 KS
drift, B48 bloom-prefiltered join, B49 fixed-point PageRank, C27
per-source caps, C28 weighted sampling, C29 word entropy, C30 bigram
PMI, C31 Zipf slope.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pipeline_airflow_docker_spark.catalog import table
from pipeline_airflow_docker_spark.functions.numeric import dsum

STAGED_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
STAGED_ORACLES: dict[str, str] = {}


def staged_query(name: str, oracle: str) -> Callable:
    def deco(fn: Callable) -> Callable:
        if name in STAGED_QUERIES:
            raise ValueError(f"duplicate staged key {name!r}")
        STAGED_QUERIES[name] = fn
        STAGED_ORACLES[name] = oracle
        return fn

    return deco


# DuckDB mirror of operators/splits.hash_mod(key, 2^32, seed): integer
# value of the first 8 hex digits of md5("{seed}:{key}").
def _dd_h32(expr: str, seed: int = 42) -> str:
    return (
        "list_reduce(list_prepend(0::BIGINT, list_transform(range(1, 9), i -> "
        f"(strpos('0123456789abcdef', substr(md5('{seed}:' || CAST({expr} AS VARCHAR)), i, 1)) - 1)::BIGINT)), "
        "(acc, d) -> acc * 16 + d)"
    )


# --------------------------------------------------------------------
# C27 per-source caps (operators/splits.py::cap_per_group): hard
# ceiling of 10 docs per source, membership content-addressed by
# seeded md5 priority. The oracle replays the identical window.
# --------------------------------------------------------------------
@staged_query(
    "q_source_caps",
    oracle="""
    SELECT doc_id, source, cap_rank FROM (
      SELECT doc_id, source,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY md5('42:' || CAST(doc_id AS VARCHAR)), doc_id
             ) AS INT) AS cap_rank
      FROM documents
    ) WHERE cap_rank <= 10
    """,
)
def q_source_caps(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pipeline_airflow_docker_spark.operators.splits import (  # noqa: PLC0415
        cap_per_group,
    )

    d = table(spark, sf_dir, "documents").select("doc_id", "source")
    return cap_per_group(d, ["source"], cap=10, key_col="doc_id")


# --------------------------------------------------------------------
# C28 weighted sampling (operators/splits.py::weighted_sample):
# Efraimidis–Spirakis A-ES, weight = n_chars, k = 100. Content-
# addressed u, so the oracle reproduces the exact sample: score =
# round(ln((h32 + 0.5) / 2^32) / w, 9), top-k by (score desc, key).
# The + 0.0 normalizes negative zero (r12 probe): the score tends to
# 0⁻ as h32 -> 2^32, and round(-tiny) is +0.0 on Spark (BigDecimal
# has no -0) but -0.0 on DuckDB (binary nearbyint) — a ~2-in-2^32
# per-doc hash event, unreachable in any fixture but real over a
# billion-doc corpus. Pinned in test_cast_grammar.py.
# --------------------------------------------------------------------
@staged_query(
    "q_sample_weighted",
    oracle=f"""
    SELECT doc_id, n_chars,
           round(ln(({_dd_h32("doc_id")} + 0.5) / 4294967296.0)
                 / n_chars, 9) + 0.0 AS sample_score
    FROM documents
    WHERE n_chars > 0
    ORDER BY sample_score DESC, doc_id
    LIMIT 100
    """,
)
def q_sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pipeline_airflow_docker_spark.operators.splits import (  # noqa: PLC0415
        weighted_sample,
    )

    d = table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    return weighted_sample(d, weight_col="n_chars", k=100, key_col="doc_id")


# --------------------------------------------------------------------
# B46 deterministic mode + lower median (operators/profile.py::
# mode_median) per event_type over value, bin width 10. Built-in
# mode() leaves ties arbitrary in both engines; this pins them.
# --------------------------------------------------------------------
@staged_query(
    "q_agg_mode",
    oracle="""
    WITH b AS (
      SELECT event_type, value,
             CAST(floor(value / 10.0) AS BIGINT) AS vbin
      FROM events WHERE value IS NOT NULL
    ),
    md AS (
      SELECT event_type, vbin AS mode_bin, c AS mode_count FROM (
        SELECT event_type, vbin, count(*) AS c,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY count(*) DESC, vbin) AS rn
        FROM b GROUP BY event_type, vbin
      ) WHERE rn = 1
    ),
    me AS (
      SELECT event_type, n, value AS median_low FROM (
        SELECT event_type, value,
               ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value) AS rn,
               count(*) OVER (PARTITION BY event_type) AS n
        FROM b
      ) WHERE rn = (n + 1) // 2
    )
    SELECT me.event_type, n, median_low, mode_bin, mode_count
    FROM me JOIN md ON md.event_type = me.event_type
    """,
)
def q_agg_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pipeline_airflow_docker_spark.operators.profile import (  # noqa: PLC0415
        mode_median,
    )

    e = table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    return mode_median(
        e.select("event_type", "value"), "event_type", "value", bin_width=10.0
    )


# --------------------------------------------------------------------
# B47 two-sample KS drift (operators/profile.py::ks_statistic):
# click-vs-view distribution gap over events.value. The oracle cumsums
# one global ordering; the operator's bin-offset decomposition must
# reproduce it exactly.
# --------------------------------------------------------------------
@staged_query(
    "q_ks_drift",
    oracle="""
    WITH pv AS (
      SELECT value,
             sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS ca,
             sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS cb
      FROM events
      WHERE event_type IN ('click', 'view') AND value IS NOT NULL
      GROUP BY value
    ),
    c AS (
      SELECT value,
             sum(ca) OVER (ORDER BY value
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cuma,
             sum(cb) OVER (ORDER BY value
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumb
      FROM pv
    ),
    t AS (SELECT CAST(sum(ca) AS BIGINT) AS n_a,
                 CAST(sum(cb) AS BIGINT) AS n_b FROM pv)
    SELECT n_a, n_b,
           round(abs(cuma::DOUBLE / n_a - cumb::DOUBLE / n_b), 6) AS ks_stat,
           value AS at_value
    FROM c, t
    ORDER BY ks_stat DESC, at_value
    LIMIT 1
    """,
)
def q_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pipeline_airflow_docker_spark.operators.profile import (  # noqa: PLC0415
        ks_statistic,
    )

    e = table(spark, sf_dir, "events")
    return ks_statistic(e, "value", "event_type", "click", "view", bin_width=10.0)


# --------------------------------------------------------------------
# C29 word-distribution entropy (operators/textstats.py::word_entropy)
# per source: H = ln(S) - sum(c*ln(c))/S, terms rounded to 6dp and
# summed in exact DECIMAL (order-independent); decimal -> double via
# the VARCHAR round-trip on the DuckDB side (correctly-rounded — see
# q_agg_moments' engine-quirk note).
# --------------------------------------------------------------------
@staged_query(
    "q_word_entropy",
    oracle="""
    WITH w AS (
      SELECT source, unnest(string_split(text, ' ')) AS w FROM documents
    ),
    c AS (
      SELECT source, w, count(*) AS c FROM w WHERE w <> '' GROUP BY source, w
    ),
    a AS (
      SELECT source, CAST(sum(c) AS BIGINT) AS n_tokens, count(*) AS n_types,
             CAST(CAST(sum(CAST(round(c * ln(c), 6) AS DECIMAL(28,6)))
                  AS VARCHAR) AS DOUBLE) AS sclc
      FROM c GROUP BY source
    )
    SELECT source, n_tokens, n_types,
           round(ln(n_tokens::DOUBLE) - sclc / n_tokens::DOUBLE, 6)
             AS entropy_nats
    FROM a
    """,
)
def q_word_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pipeline_airflow_docker_spark.operators.textstats import (  # noqa: PLC0415
        word_entropy,
    )

    return word_entropy(table(spark, sf_dir, "documents"), "source")


# --------------------------------------------------------------------
# C30 bigram PMI (operators/textstats.py::pmi_bigrams): top-20
# collocations, PMI in log space with a FIXED association order so no
# count product overflows and both engines produce the identical
# double: ln(b) + 2*ln(tu) - ln(tb) - ln(u1) - ln(u2).
# --------------------------------------------------------------------
@staged_query(
    "q_pmi_bigrams",
    oracle="""
    WITH toks AS (SELECT string_split(text, ' ') AS t FROM documents),
    pairs AS (
      SELECT p.w1 AS w1, p.w2 AS w2 FROM (
        SELECT unnest(list_transform(generate_series(1, len(t) - 1),
                      i -> struct_pack(w1 := t[i], w2 := t[i + 1]))) AS p
        FROM toks
      )
    ),
    bi AS (SELECT w1, w2, count(*) AS pair_count FROM pairs GROUP BY w1, w2),
    uni AS (
      SELECT w, count(*) AS u FROM (
        SELECT unnest(string_split(text, ' ')) AS w FROM documents
      ) WHERE w <> '' GROUP BY w
    ),
    tot AS (SELECT (SELECT sum(pair_count) FROM bi) AS tb,
                   (SELECT sum(u) FROM uni) AS tu)
    SELECT w1, w2, pair_count,
           round(ln(pair_count) + 2 * ln(tu) - ln(tb) - ln(u1.u) - ln(u2.u),
                 6) AS pmi
    FROM bi, tot
    JOIN uni u1 ON u1.w = bi.w1
    JOIN uni u2 ON u2.w = bi.w2
    WHERE pair_count >= 5
    ORDER BY pmi DESC, w1, w2
    LIMIT 20
    """,
)
def q_pmi_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pipeline_airflow_docker_spark.operators.textstats import (  # noqa: PLC0415
        pmi_bigrams,
    )

    return pmi_bigrams(table(spark, sf_dir, "documents"), min_count=5, top_k=20)


# --------------------------------------------------------------------
# C31 Zipf slope (operators/textstats.py::zipf_slope) per lang:
# least-squares ln(freq) ~ ln(rank), moments in exact DECIMAL (B37's
# trick), slope as fixed double arithmetic.
# --------------------------------------------------------------------
@staged_query(
    "q_zipf_slope",
    oracle="""
    WITH c AS (
      SELECT lang, w, count(*) AS c FROM (
        SELECT lang, unnest(string_split(text, ' ')) AS w FROM documents
      ) WHERE w <> '' GROUP BY lang, w
    ),
    xy AS (
      SELECT lang,
             round(ln(ROW_NUMBER() OVER (PARTITION BY lang
                                         ORDER BY c DESC, w)), 8) AS x,
             round(ln(c), 8) AS y
      FROM c
    ),
    m AS (
      SELECT lang, count(*) AS n_types,
             CAST(CAST(sum(CAST(round(x, 8) AS DECIMAL(28,8))) AS VARCHAR) AS DOUBLE) AS sx,
             CAST(CAST(sum(CAST(round(y, 8) AS DECIMAL(28,8))) AS VARCHAR) AS DOUBLE) AS sy,
             CAST(CAST(sum(CAST(round(x * x, 8) AS DECIMAL(28,8))) AS VARCHAR) AS DOUBLE) AS sxx,
             CAST(CAST(sum(CAST(round(x * y, 8) AS DECIMAL(28,8))) AS VARCHAR) AS DOUBLE) AS sxy
      FROM xy GROUP BY lang
    )
    SELECT lang, n_types,
           round((n_types * sxy - sx * sy) / (n_types * sxx - sx * sx), 6)
             AS zipf_slope
    FROM m
    """,
)
def q_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pipeline_airflow_docker_spark.operators.textstats import (  # noqa: PLC0415
        zipf_slope,
    )

    return zipf_slope(table(spark, sf_dir, "documents"), "lang")


# --------------------------------------------------------------------
# B48 bloom-prefiltered semi join (operators/bloomjoin.py): lineitem
# semi-joined to high-balance suppliers with an Arrow-vectorized Bloom
# prefilter ahead of the shuffle. The bloom only reduces shuffled
# volume — the exact join removes false positives, so the oracle is
# the plain IN-subquery aggregate.
# --------------------------------------------------------------------
@staged_query(
    "q_bloom_join",
    oracle="""
    SELECT l_returnflag, count(*) AS n_items,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(19,4)))
                AS VARCHAR) AS DOUBLE) AS sum_price
    FROM lineitem
    WHERE l_suppkey IN
          (SELECT s_suppkey FROM supplier WHERE s_acctbal > 5000)
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def q_bloom_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pipeline_airflow_docker_spark.operators.bloomjoin import (  # noqa: PLC0415
        bloom_semi_join,
    )

    li = table(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_returnflag", "l_extendedprice"
    )
    dim = (
        table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 5000)
        .select("s_suppkey")
    )
    semi = bloom_semi_join(li, "l_suppkey", dim, "s_suppkey")
    return (
        semi.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            dsum("l_extendedprice").alias("sum_price"),
        )
        .orderBy("l_returnflag")
    )


# --------------------------------------------------------------------
# B49 fixed-point PageRank (operators/graph.py): 3 iterations over the
# symmetrized customer–supplier trade graph, exact int64 fixed-point
# (sum order cannot perturb the result), top-20 by rank. The oracle
# unrolls the identical integer recurrence — no recursion, no floats.
# --------------------------------------------------------------------
@staged_query(
    "q_pagerank",
    oracle="""
    WITH fwd AS (
      SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS src,
                      's' || CAST(l_suppkey AS VARCHAR) AS dst
      FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    ),
    edges AS (
      SELECT src, dst FROM fwd
      UNION
      SELECT dst AS src, src AS dst FROM fwd
    ),
    deg AS (SELECT src AS node, count(*) AS deg FROM edges GROUP BY src),
    nn AS (SELECT count(*) AS n FROM deg),
    r0 AS (
      SELECT node, deg,
             1000000000000 // n AS base,
             1000000000000 // n AS rank_fp
      FROM deg, nn
    ),
    i1 AS (SELECT e.dst AS node, CAST(sum(r.rank_fp // r.deg) AS BIGINT) AS inc
           FROM r0 r JOIN edges e ON e.src = r.node GROUP BY e.dst),
    r1 AS (SELECT r.node, r.deg, r.base,
                  (15 * r.base + 85 * COALESCE(i.inc, 0)) // 100 AS rank_fp
           FROM r0 r LEFT JOIN i1 i ON i.node = r.node),
    i2 AS (SELECT e.dst AS node, CAST(sum(r.rank_fp // r.deg) AS BIGINT) AS inc
           FROM r1 r JOIN edges e ON e.src = r.node GROUP BY e.dst),
    r2 AS (SELECT r.node, r.deg, r.base,
                  (15 * r.base + 85 * COALESCE(i.inc, 0)) // 100 AS rank_fp
           FROM r1 r LEFT JOIN i2 i ON i.node = r.node),
    i3 AS (SELECT e.dst AS node, CAST(sum(r.rank_fp // r.deg) AS BIGINT) AS inc
           FROM r2 r JOIN edges e ON e.src = r.node GROUP BY e.dst),
    r3 AS (SELECT r.node, r.deg, r.base,
                  (15 * r.base + 85 * COALESCE(i.inc, 0)) // 100 AS rank_fp
           FROM r2 r LEFT JOIN i3 i ON i.node = r.node)
    SELECT node, deg, rank_fp FROM r3
    ORDER BY rank_fp DESC, node
    LIMIT 20
    """,
)
def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pipeline_airflow_docker_spark.operators.graph import (  # noqa: PLC0415
        pagerank_fixed_point,
        symmetrize,
    )

    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    edges = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .select(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("dst"),
        )
        .distinct()
    )
    pr = pagerank_fixed_point(symmetrize(edges), iterations=3)
    return pr.orderBy(F.col("rank_fp").desc(), "node").limit(20)
