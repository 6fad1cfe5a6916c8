"""Stream-stream joins.

The reference never joins two live streams (its Kafka consumers are
single-topic, SURVEY.md §1), but any event pipeline built on it grows
the need immediately — e.g. click-to-purchase attribution. Structured
Streaming requires watermarks on BOTH sides plus an event-time range
constraint in the join condition: the range bounds how long either
side's rows must be retained in the state store, so state stays finite
no matter how long the streams run. Without the time bound Spark
rejects the query (AnalysisException) rather than accumulating
unbounded state — the engine surfaces that contract instead of hiding
it.

Scale notes: the join shuffles both streams on the equality key, state
is keyed by it, and eviction follows ``watermark + upper``. Skewed keys
behave like any shuffled join (salt upstream if one user dominates).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pipeline_airflow_docker_spark.streaming.windows import (
    Horizon,
    plausible_event_time,
)


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    upper: str = "30 minutes",
    watermark: str = "2 hours",
    how: str = "inner",
    horizon: Horizon | None = None,
) -> DataFrame:
    """Join rows of ``right`` that occur within ``[left_ts, left_ts +
    upper]`` for the same ``key`` — the streaming interval/attribution
    join. Column names from both sides survive under ``l.``/``r.``
    aliases; project after joining.

    ``watermark`` bounds how late either stream may arrive; rows later
    than that are dropped, which is what allows state eviction. For
    outer variants the watermark also decides when an unmatched row is
    emitted as null-padded. ``horizon`` (see windows.py) is applied to
    BOTH sides before their watermarks — the join's global watermark is
    the min of the two sides, so one poisoned side stalls or drops the
    other's traffic too.
    """
    l = (
        plausible_event_time(left, left_ts, horizon)
        .withWatermark(left_ts, watermark)
        .alias("l")
    )
    r = (
        plausible_event_time(right, right_ts, horizon)
        .withWatermark(right_ts, watermark)
        .alias("r")
    )
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (F.col(f"r.{right_ts}") >= F.col(f"l.{left_ts}"))
        & (F.col(f"r.{right_ts}") <= F.col(f"l.{left_ts}") + F.expr(f"INTERVAL {upper}"))
    )
    return l.join(r, cond, how)
