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

from pyspark.sql import DataFrame
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
