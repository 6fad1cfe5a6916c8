"""Binned interval join — the big-big scale path for range joins.

A range join (``point BETWEEN lo AND hi``) has no equi-predicate, so
Catalyst plans a nested-loop join: fine when one side is tiny (the
`q_join_range` tier lookup), O(n·m) death at 100 TB when both sides are
facts. The standard fix (Flink interval joins, Databricks range-join
binning) is to quantize the range dimension into fixed-width bins:

- each interval row is replicated to every bin it overlaps
  (``explode(sequence(bin(lo), bin(hi)))`` — bounded by
  ``len/bin_width + 1`` replicas),
- each point row lands in exactly ONE bin (no output duplicates),
- the join becomes an equi-join on ``(bin, *keys)`` — shuffle-partition
  parallel, AQE-skew-splittable — followed by a cheap residual filter
  re-checking the true range predicate inside each bin.

Pick ``bin_seconds`` near the typical interval length: much smaller
multiplies interval replicas; much larger packs unrelated rows into one
bin and shifts work to the residual filter.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def bin_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    lo_col: str,
    hi_col: str,
    keys: list[str] | None = None,
    bin_seconds: int = 3600,
) -> DataFrame:
    """Join ``points`` to every interval with
    ``lo <= point_ts < hi`` (half-open, the time-window convention),
    optionally also matching on equi-``keys``, without ever planning a
    nested-loop join.

    Both inputs may be arbitrarily large: the only shuffle is the
    equi-join on ``(bin, *keys)``. The bin column is dropped from the
    result; all other columns of both frames are kept (shared ``keys``
    columns are coalesced by the list-join).
    """
    width = F.lit(int(bin_seconds) * 1_000_000)  # microseconds
    pb = points.withColumn("__bin", F.floor(F.unix_micros(F.col(point_ts)) / width))
    ib = intervals.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.floor(F.unix_micros(F.col(lo_col)) / width),
                F.floor(F.unix_micros(F.col(hi_col)) / width),
            )
        ),
    )
    joined = pb.join(ib, on=["__bin"] + (keys or [])).filter(
        (F.col(point_ts) >= F.col(lo_col)) & (F.col(point_ts) < F.col(hi_col))
    )
    return joined.drop("__bin")


def sessionize(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    gap_seconds: int,
    order_tiebreakers: Sequence[str] = (),
    session_col: str = "session_idx",
) -> DataFrame:
    """Batch sessionization: assign every event a per-key session
    index, where a gap > ``gap_seconds`` between consecutive events
    starts a new session (0-based). The batch mirror of the streaming
    session window (``streaming/windows.py::session_agg``) for
    backfills and reprocessing.

    Scale: one shuffle — both window passes (lag, running sum) share
    the identical partitionBy/orderBy spec, so Catalyst plans a single
    Exchange + Sort and evaluates them in one Window node chain. No
    per-key collect, no iteration; a key's events must sort within a
    task (the same bound every per-key window has — salt mega-keys
    upstream if one user exceeds a partition).

    Deterministic: ties on ``ts_col`` break by ``order_tiebreakers``
    (pass the event id); session numbering is then a pure function of
    the data.

    ``session_col`` is BIGINT: the index is a per-key running count,
    and unlike Spark's int-typed ``row_number`` (whose width is the
    engine's own contract) this narrowing would be ours — a hot key
    past 2.147B sessions would wrap silently under the session's
    ``ansi.enabled=false``.
    """
    keys = [F.col(c) for c in key_cols]
    order = [F.col(ts_col)] + [F.col(c) for c in order_tiebreakers]
    w = Window.partitionBy(*keys).orderBy(*order)
    prev = F.lag(ts_col).over(w)
    gap_us = F.lit(int(gap_seconds) * 1_000_000)
    is_new = (
        prev.isNull()
        | ((F.unix_micros(F.col(ts_col)) - F.unix_micros(prev)) > gap_us)
    ).cast("long")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        df.withColumn("__is_new", is_new)
        .withColumn(session_col, (F.sum("__is_new").over(run) - 1).cast("long"))
        .drop("__is_new")
    )


def scd2_intervals(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    order_tiebreakers: Sequence[str] = (),
    from_col: str = "valid_from",
    to_col: str = "valid_to",
    current_col: str = "is_current",
) -> DataFrame:
    """Build slowly-changing-dimension (type 2) validity intervals from
    a change stream: each row becomes a version valid from its own
    timestamp until the key's next change (NULL = still current) — the
    half-open [valid_from, valid_to) convention, so as-of lookups are
    ``valid_from <= t AND (valid_to IS NULL OR t < valid_to)``.

    One shuffle (the per-key lead window); no self-join — the naive
    formulation joins each row to "the next row per key", which is the
    same window in disguise at twice the cost. Ties on ``ts_col``
    break by ``order_tiebreakers`` for deterministic interval chains.
    """
    keys = [F.col(c) for c in key_cols]
    order = [F.col(ts_col)] + [F.col(c) for c in order_tiebreakers]
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn(from_col, F.col(ts_col))
        .withColumn(to_col, F.lead(ts_col).over(w))
        .withColumn(current_col, F.col(to_col).isNull())
    )


def coalesce_intervals(
    df: DataFrame,
    key_cols: str | Sequence[str],
    start_col: str,
    end_col: str,
    order_tiebreak: Sequence[str] = (),
    island_col: str = "island",
) -> DataFrame:
    """Merge overlapping (or touching) intervals per key into maximal
    covered islands — the gaps-and-islands coalesce behind uptime/SLA
    windows, maintenance-window stitching, and interval dedup before a
    range join (fewer, wider probe intervals = fewer bin replicas in
    ``bin_interval_join``).

    Classic running-max form: an interval starts a new island iff its
    start exceeds the max end seen so far within the key
    (``ROWS UNBOUNDED PRECEDING AND 1 PRECEDING``); the island id is
    the running sum of those flags — deterministic for any tie order
    (equal starts contribute the same running max), with
    ``order_tiebreak`` available to pin total order anyway.

    Adds ``island_col`` (1-based per key). Aggregate downstream with
    ``groupBy(*keys, island)`` — the group-by clusters on a superset
    of the window's partition keys, so the whole pipeline is ONE
    exchange (plan-gated in tests). Skew note: one hot key serializes
    its window partition; islands can't be computed independently of
    order, so pre-split hot keys by coarse time range and re-merge
    island boundaries if a single key dominates.
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    w = Window.partitionBy(*keys).orderBy(start_col, end_col, *order_tiebreak)
    prev_max_end = F.max(end_col).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    new_island = F.when(
        prev_max_end.isNull() | (F.col(start_col) > prev_max_end), 1
    ).otherwise(0)
    running = F.sum(new_island).over(
        w.rowsBetween(Window.unboundedPreceding, 0)
    )
    return df.withColumn(island_col, running)
