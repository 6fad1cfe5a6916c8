"""The default-window-frame cross-engine contract (round 15,
session 2).

Every running aggregate in the graded set (q_win_frame's analytic
windows, q_join_asof's single-pass window, the sessionize/intervals
family's lag chains) rides on frame semantics that are easy to get
silently wrong: with an ORDER BY and no explicit frame, the SQL
default is RANGE UNBOUNDED PRECEDING..CURRENT ROW — which
accumulates by PEER GROUP, so TIED rows share one running total, and
last_value returns the CURRENT PEER GROUP's tail, not the partition
tail. The r15 probe pinned the whole surface AGREEING:

- Running sum over ties: tied keys share the peer-group total in
  BOTH engines ([(1,10),(2,60),(2,60),(3,100)]); explicit RANGE
  UNBOUNDED..CURRENT ROW is identical to the default; ROWS
  UNBOUNDED PRECEDING switches both to per-row accumulation.
- last_value/first_value/nth_value under the default frame: the
  peer-group-tail gotcha reproduces IDENTICALLY (last_value at k=2
  is 30 for both tied rows; nth_value(v,2) is NULL until the frame
  holds two rows).
- count(*) over ties, OVER () whole-partition, and RANGE numeric
  offset frames (1 PRECEDING on the ORDER BY value, not row
  position) all agree.

DIALECT: frame EXCLUDE clauses (EXCLUDE CURRENT ROW / GROUP / TIES)
are DuckDB-only — Spark's parser rejects them; no portable spelling
exists short of subtracting the excluded rows manually. No graded
key uses EXCLUDE (census).

Probe provenance: /tmp probe run 2026-08-16; SCALE.md §23.
"""

from __future__ import annotations

import duckdb
import pytest

V_S = "VALUES (1,10),(2,20),(2,30),(3,40) v(k, v)"
V_D = "(VALUES (1,10),(2,20),(2,30),(3,40)) v(k, v)"


def _duck():
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    return con


def _pair(spark, con, s_expr, want):
    s = [
        tuple(r) for r in spark.sql(
            f"SELECT k, {s_expr} FROM {V_S} ORDER BY k, v"
        ).collect()
    ]
    d = con.execute(
        f"SELECT k, {s_expr} FROM {V_D} ORDER BY k, v"
    ).fetchall()
    assert s == [tuple(r) for r in d] == want, (s_expr, s, d)


def test_default_frame_is_range_peer_groups_both(spark):
    con = _duck()
    _pair(spark, con, "sum(v) OVER (ORDER BY k)",
          [(1, 10), (2, 60), (2, 60), (3, 100)])
    _pair(spark, con,
          "sum(v) OVER (ORDER BY k RANGE BETWEEN UNBOUNDED PRECEDING"
          " AND CURRENT ROW)",
          [(1, 10), (2, 60), (2, 60), (3, 100)])
    _pair(spark, con, "count(*) OVER (ORDER BY k)",
          [(1, 1), (2, 3), (2, 3), (3, 4)])
    _pair(spark, con, "sum(v) OVER ()",
          [(1, 100), (2, 100), (2, 100), (3, 100)])


def test_rows_frame_accumulates_per_row_both(spark):
    con = _duck()
    _pair(spark, con,
          "sum(v) OVER (ORDER BY k, v ROWS UNBOUNDED PRECEDING)",
          [(1, 10), (2, 30), (2, 60), (3, 100)])


def test_value_functions_peer_group_gotcha_identical(spark):
    """last_value under the default frame returns the CURRENT peer
    group's tail — the classic silent-wrong-answer — identically in
    both engines; same for first_value and nth_value's
    frame-not-yet-filled NULL."""
    con = _duck()
    _pair(spark, con, "last_value(v) OVER (ORDER BY k)",
          [(1, 10), (2, 30), (2, 30), (3, 40)])
    _pair(spark, con, "first_value(v) OVER (ORDER BY k)",
          [(1, 10), (2, 10), (2, 10), (3, 10)])
    _pair(spark, con, "nth_value(v, 2) OVER (ORDER BY k)",
          [(1, None), (2, 20), (2, 20), (3, 20)])


def test_range_numeric_offset_frame_agrees(spark):
    """RANGE n PRECEDING bounds on the ORDER BY VALUE (k-1), not on
    row position — k=3 sums k in {2,3} = 90, not the last-2-rows."""
    con = _duck()
    _pair(spark, con,
          "sum(v) OVER (ORDER BY k RANGE BETWEEN 1 PRECEDING"
          " AND CURRENT ROW)",
          [(1, 10), (2, 60), (2, 60), (3, 90)])


def test_exclude_clause_is_duckdb_only(spark):
    from pyspark.errors import ParseException  # noqa: PLC0415

    con = _duck()
    q = (
        "SELECT k, sum(v) OVER (ORDER BY k ROWS BETWEEN UNBOUNDED"
        " PRECEDING AND CURRENT ROW EXCLUDE CURRENT ROW)"
    )
    with pytest.raises(ParseException):
        spark.sql(f"{q} FROM {V_S}").collect()
    d = con.execute(f"{q} FROM {V_D} ORDER BY k, v").fetchall()
    assert [tuple(r) for r in d] == [
        (1, None), (2, 10), (2, 30), (3, 60)
    ]


def test_no_graded_oracle_uses_exclude():
    from pipeline_airflow_docker_spark import plans  # noqa: PLC0415

    for key, sql in plans.ORACLES.items():
        assert "exclude" not in sql.lower(), key
