"""Streaming qkeys (SURVEY.md §2 streaming closure) — each runs a real
Structured Streaming query (readStream file source standing in for the
reference's Kafka topics) bounded by Trigger.AvailableNow, and is
graded against a batch-SQL oracle: the unified-semantics guarantee
makes streaming-vs-batch equality a meaningful correctness check.

DuckDB oracle notes: Spark's F.window starts are epoch-aligned
multiples of the slide — date_trunc/make_timestamp arithmetic
reproduces them; session windows are gaps-and-islands in SQL.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pipeline_airflow_docker_spark.catalog import table
from pipeline_airflow_docker_spark.functions.materialize import scratch_mkdtemp
from pipeline_airflow_docker_spark.plans.registry import query
from pipeline_airflow_docker_spark.streaming.runner import run_to_df
from pipeline_airflow_docker_spark.streaming.sinks import (
    latest_by_key,
    upsert_foreach_batch,
)
from pipeline_airflow_docker_spark.streaming.sources import stream_table
from pipeline_airflow_docker_spark.streaming.windows import (
    dedup_by_key,
    session_counts,
    sliding_counts,
    tumbling_counts,
)

_DSUM_VALUE = "CAST(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS STRING) AS DOUBLE) AS sum_value"

# Event-time plausibility horizon for the event-time-STATEFUL keys
# (watermark dedup/late-drop/session/interval-join and anything doing
# max_ts+delta sentinel arithmetic). The mechanism lives in the
# operator layer (streaming/windows.py::plausible_event_time, a
# ``horizon=`` parameter on every stateful builder — see there for the
# watermark-poisoning rationale); these qkeys DECLARE the calendar-2024
# value (plans/contracts.py — all base/jitter fixture traffic), and
# each oracle applies the IDENTICAL bound. Keys that are not
# event-time-stateful (e.g. q_stream_tumbling's complete-mode rollup)
# process far-future rows fine and take no filter.
from pipeline_airflow_docker_spark.plans.contracts import HORIZON_2024  # noqa: E402
from pipeline_airflow_docker_spark.streaming.windows import (  # noqa: E402
    plausible_event_time,
)

_PLAUSIBLE_SQL = (
    f"ts >= TIMESTAMP '{HORIZON_2024[0]}' AND ts < TIMESTAMP '{HORIZON_2024[1]}'"
)


def _plausible(ev: DataFrame) -> DataFrame:
    """The declared horizon, for the keys that must filter OUTSIDE an
    operator call (batch anchors for sentinel arithmetic)."""
    return plausible_event_time(ev, "ts", HORIZON_2024)


# --------------------------------------------------------------------
# Tumbling windows (generalizes the reference's per-batch counters,
# S7/G5) — streaming run, batch oracle.
# --------------------------------------------------------------------
@query(
    "q_stream_tumbling",
    oracle=f"""
    SELECT date_trunc('hour', ts) AS window_start, event_type,
           COUNT(*) AS n_events, {_DSUM_VALUE}
    FROM events GROUP BY 1, 2
    """,
)
def q_stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = stream_table(spark, sf_dir, "events")
    return run_to_df(tumbling_counts(ev, "1 hour"), output_mode="complete")


# --------------------------------------------------------------------
# Sliding windows: every event belongs to exactly window/slide = 2
# windows; the oracle replays that membership with a 2-row series.
# --------------------------------------------------------------------
@query(
    "q_stream_sliding",
    oracle="""
    SELECT time_bucket(INTERVAL 30 MINUTE, ts) - i * INTERVAL 30 MINUTE
             AS window_start,
           event_type, COUNT(*) AS n_events
    FROM events, generate_series(0, 1) t(i)
    GROUP BY 1, 2
    """,
)
def q_stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = stream_table(spark, sf_dir, "events")
    return run_to_df(
        sliding_counts(ev, "1 hour", "30 minutes"), output_mode="complete"
    )


# --------------------------------------------------------------------
# Session windows (gap 10 min) per user — stateful merge; the oracle
# is the classic gaps-and-islands rewrite. session_end = last + gap.
# --------------------------------------------------------------------
@query(
    "q_stream_session",
    oracle=f"""
    WITH g AS (
      SELECT user_id, ts, value,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       > INTERVAL 10 MINUTE OR
                  LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events WHERE {_PLAUSIBLE_SQL}
    ),
    s AS (
      SELECT user_id, ts, value,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM g
    )
    SELECT MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 10 MINUTE AS session_end,
           user_id, COUNT(*) AS n_events, {_DSUM_VALUE}
    FROM s GROUP BY user_id, session_id
    """,
)
def q_stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = stream_table(spark, sf_dir, "events")
    return run_to_df(
        session_counts(ev, "10 minutes", horizon=HORIZON_2024),
        output_mode="complete",
    )


# --------------------------------------------------------------------
# Stateful dedup: the source is doubled (union with itself — modeling
# at-least-once redelivery), dropDuplicatesWithinWatermark restores
# exactly-once. Oracle: the original rows.
# --------------------------------------------------------------------
@query(
    "q_stream_dedup",
    oracle=f"SELECT event_id, ts, user_id, event_type, value, props "
    f"FROM events WHERE {_PLAUSIBLE_SQL}",
)
def q_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = stream_table(spark, sf_dir, "events")
    redelivered = ev.unionByName(ev)
    return run_to_df(
        dedup_by_key(redelivered, ["event_id"], horizon=HORIZON_2024),
        output_mode="append",
    )


# --------------------------------------------------------------------
# S7 bounded ingestion [ref dags/kafka_to_mongo_pipeline.py:55-82]:
# consume from earliest, stop at 100 messages, project + uppercase
# (P3, ref :76). The poll-until-100 loop (which spins forever when the
# topic is short — reference bug 3) becomes: rate-capped micro-batches
# (maxFilesPerTrigger, the file-source analog of maxOffsetsPerTrigger)
# under Trigger.AvailableNow, then a deterministic bound — the 100
# earliest messages in topic order, which the (ts, event_id) order
# stands in for. The stream terminates even on a short topic.
# --------------------------------------------------------------------
@query(
    "q_stream_bounded",
    oracle="""
    SELECT event_id, upper(event_type) AS event_type_u FROM (
      SELECT event_id, event_type FROM events ORDER BY ts, event_id LIMIT 100
    )
    """,
)
def q_stream_bounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = stream_table(spark, sf_dir, "events", n_files=2, max_files_per_trigger=1)
    consumed = run_to_df(
        ev.select("event_id", "ts", "event_type"), output_mode="append"
    )
    return (
        consumed.orderBy("ts", "event_id")
        .limit(100)
        .select("event_id", F.upper("event_type").alias("event_type_u"))
    )


# --------------------------------------------------------------------
# K3 keyed upsert [ref dags/kafka_to_mongo_pipeline_enchanced.py:
# 141-145]: streaming foreachBatch merge, latest (ts, event_id) wins
# per (user_id, event_type). Runs as TWO micro-batches
# (maxFilesPerTrigger=1 over a 2-file stage) so the merge genuinely
# crosses batch boundaries; the result is batch-order-independent.
# --------------------------------------------------------------------
@query(
    "q_upsert_latest",
    oracle="""
    SELECT user_id, event_type, ts, event_id, value FROM (
      SELECT user_id, event_type, ts, event_id, value,
             ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def q_upsert_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = stream_table(spark, sf_dir, "events", n_files=2, max_files_per_trigger=1)
    target = os.path.join(scratch_mkdtemp("padspark_upsert_"), "state")
    run_to_df(
        ev.select("user_id", "event_type", "ts", "event_id", "value"),
        output_mode="append",
        foreach_batch=upsert_foreach_batch(
            target, keys=["user_id", "event_type"], version_cols=["ts", "event_id"]
        ),
    )
    return spark.read.parquet(target)


# --------------------------------------------------------------------
# Custom stateful operator (applyInPandasWithState): per-user running
# totals whose state genuinely crosses micro-batches (2 files, 1 per
# trigger; users span both). The latest emission per key equals the
# batch aggregate — that equivalence is the oracle contract.
# --------------------------------------------------------------------
@query(
    "q_stream_stateful",
    oracle="""
    SELECT user_id, COUNT(*) AS n_events, MAX(value) AS max_value
    FROM events GROUP BY user_id
    """,
)
def q_stream_stateful(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pipeline_airflow_docker_spark.streaming.stateful import (  # noqa: PLC0415
        running_totals,
    )

    ev = stream_table(spark, sf_dir, "events", n_files=2, max_files_per_trigger=1)
    emissions = run_to_df(
        running_totals(ev, "user_id", "value"), output_mode="update"
    )
    return emissions.groupBy("user_id").agg(
        F.max("n_so_far").alias("n_events"),
        F.max("max_so_far").alias("max_value"),
    )
# joins a static broadcast dimension per micro-batch — no state needed.
# --------------------------------------------------------------------
@query(
    "q_stream_static_join",
    oracle="""
    SELECT e.event_type, n.n_name AS region_name, COUNT(*) AS n_events
    FROM events e JOIN nation n ON e.user_id % 25 = n.n_nationkey
    GROUP BY e.event_type, n.n_name
    """,
)
def q_stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = stream_table(spark, sf_dir, "events")
    dim = table(spark, sf_dir, "nation")
    joined = ev.join(
        F.broadcast(dim), ev.user_id % 25 == dim.n_nationkey
    ).select("event_type", F.col("n_name").alias("region_name"))
    agg = joined.groupBy("event_type", "region_name").agg(
        F.count(F.lit(1)).alias("n_events")
    )
    return run_to_df(agg, output_mode="complete")


# --------------------------------------------------------------------
# Stream-stream interval join: click -> purchase attribution within 30
# minutes per user. Both sides are live streams with watermarks; the
# event-time range bound keeps join state finite (see streaming/
# joins.py). Oracle: the identical interval join at rest.
# --------------------------------------------------------------------
@query(
    "q_stream_stream_join",
    oracle=f"""
    WITH p AS (SELECT * FROM events WHERE {_PLAUSIBLE_SQL})
    SELECT a.event_id AS click_id, b.event_id AS purchase_id,
           a.user_id, a.ts AS click_ts, b.ts AS purchase_ts
    FROM p a JOIN p b
      ON a.user_id = b.user_id
     AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 30 MINUTE
    WHERE a.event_type = 'click' AND b.event_type = 'purchase'
    """,
)
def q_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pipeline_airflow_docker_spark.streaming.joins import (  # noqa: PLC0415
        interval_join,
    )

    clicks = stream_table(spark, sf_dir, "events").where(
        F.col("event_type") == "click"
    )
    purchases = stream_table(spark, sf_dir, "events").where(
        F.col("event_type") == "purchase"
    )
    joined = interval_join(
        clicks,
        purchases,
        key="user_id",
        upper="30 minutes",
        watermark="2 hours",
        horizon=HORIZON_2024,
    )
    return run_to_df(
        joined.select(
            F.col("l.event_id").alias("click_id"),
            F.col("r.event_id").alias("purchase_id"),
            F.col("l.user_id").alias("user_id"),
            F.col("l.ts").alias("click_ts"),
            F.col("r.ts").alias("purchase_ts"),
        ),
        output_mode="append",
        state_partitions=8,
    )


# --------------------------------------------------------------------
# Stream-stream LEFT OUTER interval join: click -> purchase
# attribution where unconverted clicks ALSO emit (null-padded) — the
# funnel-analysis shape q_stream_stream_join's inner variant drops.
# Outer emission is watermark-driven: a left row may only be declared
# unmatched once the global watermark proves no qualifying purchase
# can still arrive, so on a bounded replay the final rows need the
# watermark pushed past end-of-data. stage_files appends two sentinel
# micro-batches at +25h/+50h (watermark 2h, join upper bound 30 min):
# the first jumps the watermark computation, the second's batch
# performs eviction under the advanced watermark — the same flush a
# production topic gets from its continuing traffic. Sentinel rows
# carry negative user_ids (matching nothing and each other not) and
# are filtered from the result; they exist to move event time only.
# The sentinel filter runs on the BATCH result, not in the stream:
# in-stream, Catalyst pushes it below the EventTimeWatermark node
# into the left scan, the sentinel clicks then never advance the
# left-side watermark, and the global watermark (min of both sides)
# stays 2.5h behind — silently withholding the tail's outer rows.
# Oracle: the identical LEFT JOIN at rest over the real events.
# --------------------------------------------------------------------
@query(
    "q_stream_join_outer",
    oracle=f"""
    WITH p AS (SELECT * FROM events WHERE {_PLAUSIBLE_SQL})
    SELECT a.event_id AS click_id, b.event_id AS purchase_id,
           a.user_id, a.ts AS click_ts, b.ts AS purchase_ts
    FROM p a LEFT JOIN p b
      ON a.user_id = b.user_id
     AND b.event_type = 'purchase'
     AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 30 MINUTE
    WHERE a.event_type = 'click'
    """,
)
def q_stream_join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datetime import timedelta  # noqa: PLC0415

    from pipeline_airflow_docker_spark.streaming.joins import (  # noqa: PLC0415
        interval_join,
    )
    from pipeline_airflow_docker_spark.streaming.sources import (  # noqa: PLC0415
        stage_files,
    )

    ev = table(spark, sf_dir, "events")

    def project(joined: DataFrame) -> DataFrame:
        # The ONE output select list — shared by the streaming path and
        # the empty-source branch so the schemas cannot drift apart.
        return joined.select(
            F.col("l.event_id").alias("click_id"),
            F.col("r.event_id").alias("purchase_id"),
            F.col("l.user_id").alias("user_id"),
            F.col("l.ts").alias("click_ts"),
            F.col("r.ts").alias("purchase_ts"),
        )

    ev = _plausible(ev)  # sentinel anchor max_ts+50h must stay in range
    max_ts = ev.agg(F.max("ts")).collect()[0][0]
    if max_ts is None:
        # Empty source: there is no max ts to anchor the watermark
        # flush sentinels on, and nothing to join — run the same
        # projection over an empty batch join, so the output schema is
        # derived from the real select expressions, not a literal.
        empty = ev.limit(0)
        return project(
            empty.alias("l").join(empty.alias("r"), F.lit(False), "left_outer")
        )

    def sentinels(hours: int, base_id: int) -> DataFrame:
        ts = max_ts + timedelta(hours=hours)
        rows = [
            (base_id, ts, -1, "click", 0.0, None),
            (base_id - 1, ts, -2, "purchase", 0.0, None),
        ]
        return spark.createDataFrame(rows, ev.schema)

    path = stage_files(
        spark,
        [ev, sentinels(25, -1), sentinels(50, -3)],
        cache_key=("events_flush", sf_dir),
    )
    schema = spark.read.parquet(path).schema
    s = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )
    clicks = s.where(F.col("event_type") == "click")
    purchases = s.where(F.col("event_type") == "purchase")
    joined = interval_join(
        clicks,
        purchases,
        key="user_id",
        upper="30 minutes",
        watermark="2 hours",
        how="leftOuter",
    )
    emitted = run_to_df(
        project(joined),
        output_mode="append",
        state_partitions=8,
    )
    return emitted.filter(F.col("user_id") >= 0)


# --------------------------------------------------------------------
# Watermark late-data drop, graded end-to-end: an upstream replays
# copies of the first six hours of events (fresh event_ids) AFTER the
# watermark has passed and their hourly windows have been evicted, so
# the windowed aggregation must DROP them — counting them would
# double-bill history, re-emitting them would duplicate closed windows
# (the at-least-once poison the reference's consumer ingests silently,
# SURVEY.md §0 bug 3). Batch choreography matters and is pinned by the
# stage_files order: Spark evicts-and-emits closed windows at the end
# of the FIRST batch that runs under the advanced watermark, and a
# late row is only dropped once its window's state is gone — so the
# replayed rows are staged one batch AFTER an on-time batch (the
# held-out max-ts event) that triggers that eviction; staged directly
# behind the bulk load they would merge into the still-open windows
# (verified: numRowsDroppedByWatermark=0 in that ordering). Two
# sentinel batches then flush the tail windows, excluded on the BATCH
# result (in-stream the filter would push below the watermark node —
# see q_stream_join_outer). Oracle: hourly counts over the ORIGINAL
# events only.
# --------------------------------------------------------------------
@query(
    "q_stream_late_drop",
    oracle=f"""
    SELECT date_trunc('hour', ts) AS window_start, event_type,
           COUNT(*) AS n_events, {_DSUM_VALUE}
    FROM events WHERE {_PLAUSIBLE_SQL} GROUP BY 1, 2
    """,
)
def q_stream_late_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datetime import timedelta  # noqa: PLC0415

    from pipeline_airflow_docker_spark.streaming.sources import (  # noqa: PLC0415
        stage_files,
    )

    ev = _plausible(table(spark, sf_dir, "events"))
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).collect()[0]
    if hi is None:
        # Empty source (see q_stream_join_outer): run the SAME windowed
        # aggregation over the empty batch relation (withWatermark is a
        # no-op in batch), so the output schema is derived from
        # tumbling_counts' real select list, not a string literal.
        return tumbling_counts(ev.limit(0), "1 hour", delay="10 minutes")
    cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]
    bulk = ev.filter(F.col("ts") < F.lit(hi))
    held_out = ev.filter(F.col("ts") == F.lit(hi))
    late = ev.filter(F.col("ts") < F.lit(lo + timedelta(hours=6))).select(
        (F.col("event_id") + 10_000_000).alias("event_id"), *cols[1:]
    )

    def sentinel(hours: int, eid: int) -> DataFrame:
        row = [(eid, hi + timedelta(hours=hours), -1, "click", 0.0, None)]
        return spark.createDataFrame(row, ev.schema)

    path = stage_files(
        spark,
        [bulk, held_out, late, sentinel(25, -1), sentinel(50, -2)],
        cache_key=("events_late", sf_dir),
    )
    schema = spark.read.parquet(path).schema
    s = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )
    emitted = run_to_df(
        tumbling_counts(s, "1 hour", delay="10 minutes"),
        output_mode="append",
        state_partitions=8,
    )
    return emitted.filter(F.col("window_start") <= F.lit(hi))


__all__ = ["latest_by_key"]


# --------------------------------------------------------------------
# Streaming E2E capstone — the reference's whole DAG shape
# (consume -> dedup -> transform -> windowed aggregate -> idempotent
# sink -> serve) as ONE graded unit [ref dags/kafka_to_mongo_pipeline
# .py:55-82 consume+transform+sink, kafka_to_mongo_pipeline_enchanced
# .py:141-145 idempotent upsert]: redelivered events (the stream is
# unioned with itself) are removed by stateful dedup, click events
# aggregate into hourly tumbling (window, type) counts, each
# micro-batch merges into the parquet upsert target keyed on the
# window, and the served table is the graded output. The oracle
# replays it relationally: DISTINCT events -> filter -> hour bucket ->
# grouped counts.
# --------------------------------------------------------------------
@query(
    "q_stream_e2e",
    oracle=f"""
    SELECT date_trunc('hour', ts) AS window_start,
           event_type,
           COUNT(*) AS n_events,
           CAST(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS STRING) AS DOUBLE) AS sum_value
    FROM events
    WHERE event_type IN ('click', 'purchase') AND {_PLAUSIBLE_SQL}
    GROUP BY 1, 2
    """,
)
def q_stream_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pipeline_airflow_docker_spark.streaming.windows import (  # noqa: PLC0415
        dedup_by_key,
        tumbling_counts,
    )

    ev = stream_table(spark, sf_dir, "events", n_files=2, max_files_per_trigger=1)
    redelivered = ev.unionByName(ev)  # at-least-once delivery simulated
    deduped = dedup_by_key(redelivered, ["event_id"], horizon=HORIZON_2024)
    filtered = deduped.filter(F.col("event_type").isin("click", "purchase"))
    agg = tumbling_counts(filtered, window="1 hour", delay=None)
    target = os.path.join(scratch_mkdtemp("padspark_e2e_"), "serve")
    run_to_df(
        agg,
        output_mode="complete",
        foreach_batch=upsert_foreach_batch(
            target,
            keys=["window_start", "event_type"],
            version_cols=["n_events"],
        ),
    )
    return spark.read.parquet(target)
