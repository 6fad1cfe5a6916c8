"""gap_fill_hourly (B25) — the fill-step budget guard.

The round-7 timestamp-era fuzz block proved the min..max grid is
unbounded against corrupt timestamps: one 1900 row plus one year-9999
row under the same key is a ~71M-bucket grid whose sequence explode
OOM-killed the JVM. Like the dedup pair guard, the operator must
refuse BEFORE generating anything, with an error naming the remedy.
"""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from pipeline_airflow_docker_spark.operators.timeseries import gap_fill_hourly


def _frame(spark, stamps):
    return spark.createDataFrame(
        [(1, t, 1.0) for t in stamps], "k int, ts timestamp, v double"
    )


def test_guard_refuses_century_grid(spark):
    df = _frame(
        spark,
        [datetime.datetime(1900, 1, 1), datetime.datetime(9999, 12, 31)],
    )
    with pytest.raises(ValueError, match="missing buckets.*max_fill_steps"):
        gap_fill_hourly(df, "k", "ts", "v")


def test_guard_opt_out_and_range_filter(spark):
    stamps = [
        datetime.datetime(1900, 1, 1),
        datetime.datetime(2024, 1, 1, 0, 30),
        datetime.datetime(2024, 1, 1, 3, 45),
    ]
    df = _frame(spark, stamps)
    # filtering to the fill window is the documented remedy
    filtered = df.filter(F.col("ts") >= F.lit("2024-01-01").cast("timestamp"))
    out = gap_fill_hourly(filtered, "k", "ts", "v").collect()
    assert len(out) == 4  # 00,01,02,03
    filled = [r for r in out if r.n_events == 0]
    assert len(filled) == 2 and all(r.ffill_total == 1.0 for r in filled)
    # a small grid passes the guard untouched, and a tiny explicit
    # budget refuses even this one
    with pytest.raises(ValueError, match="max_fill_steps=1"):
        gap_fill_hourly(filtered, "k", "ts", "v", max_fill_steps=1)
    # None opts out entirely (same small frame — proves the knob wires
    # through, without manufacturing a huge grid)
    assert len(gap_fill_hourly(filtered, "k", "ts", "v", max_fill_steps=None).collect()) == 4


def test_max_gap_hours_skips_series_breaks(spark):
    """The scale path (round 11): gaps longer than max_gap_hours are
    series breaks — left unfilled — so output stays bounded on
    legitimately sparse corpora. Short gaps still fill exactly."""
    stamps = [
        datetime.datetime(2024, 1, 1, 0, 10),   # bucket 00
        datetime.datetime(2024, 1, 1, 2, 20),   # bucket 02 (1-hour gap)
        datetime.datetime(2024, 1, 1, 9, 30),   # bucket 09 (6-hour break)
    ]
    out = gap_fill_hourly(_frame(spark, stamps), "k", "ts", "v", max_gap_hours=2)
    rows = {r.bucket.hour: r for r in out.collect()}
    assert sorted(rows) == [0, 1, 2, 9]  # 01 filled; 03..08 skipped
    assert rows[1].n_events == 0 and rows[1].ffill_total == 1.0
    assert rows[9].n_events == 1 and rows[9].ffill_total == 1.0
    # Uncapped fills the whole grid: 00..09 inclusive.
    full = gap_fill_hourly(_frame(spark, stamps), "k", "ts", "v")
    assert full.count() == 10


def test_max_gap_hours_is_the_guards_scale_path(spark):
    """A corpus whose single oversized gap alone blows the budget must
    refuse uncapped (naming the knob) and PASS capped — the guard
    counts only fillable gaps."""
    stamps = [
        datetime.datetime(2024, 1, 1, 0, 0),
        datetime.datetime(2024, 1, 1, 1, 30),
        datetime.datetime(2030, 1, 1, 0, 0),  # ~52.6k-hour break
    ]
    df = _frame(spark, stamps)
    with pytest.raises(ValueError, match="max_gap_hours"):
        gap_fill_hourly(df, "k", "ts", "v", max_fill_steps=1000)
    out = gap_fill_hourly(
        df, "k", "ts", "v", max_fill_steps=1000, max_gap_hours=24
    )
    # 00 and 01 are adjacent buckets (no gap) and the 2030 break is
    # skipped, so the output is exactly the three observed buckets.
    assert out.count() == 3
