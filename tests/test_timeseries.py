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
