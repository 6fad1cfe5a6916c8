"""The date/interval function cross-engine contract (round 14).

The r14 probe ran calendar arithmetic through both engines:

AGREEMENTS (pinned):
1. Month-end SATURATION agrees: '2024-01-31' + 1 MONTH -> 2024-02-29
   in both; leap-day + 1 YEAR -> 2025-02-28 in both. add_months and
   `+ INTERVAL` agree with each other too.
2. last_day, date_trunc('week', ..) (Monday-start), timestamp
   difference as an interval, and day-granularity datediff agree —
   the latter as a PAIR: Spark ``datediff(end, start)`` == DuckDB
   ``datediff('day', start, end)`` (argument orders differ!).

DIALECTS / NON-PAIRS (pinned):
3. ``dayofweek`` and ``extract(DOW ...)``: Spark numbers Sunday=1..7,
   DuckDB Sunday=0..6 — a constant off-by-one. Oracle spelling for a
   Spark dayofweek is ``dayofweek(..) + 1``.
4. ``date - date``: Spark returns an INTERVAL, DuckDB an INTEGER day
   count — spell day differences with the datediff pair instead.
5. ``months_between`` has NO DuckDB pair: Spark returns a 31-day-based
   FRACTION (anniversary-exact only on matching day-of-month), while
   DuckDB ``datediff('month', ..)`` counts month-BOUNDARY crossings
   ('2024-01-31' -> '2024-02-15' is 0.48 on Spark, 1 on DuckDB). Any
   graded key needing month deltas must use boundary counts on both
   sides (month truncation diff) or day-based math.

Census: no graded key uses dayofweek/extract(DOW)/months_between or
subtracts dates directly; q_fn_date's surfaces are the agreeing ones.

Probe provenance: /tmp/probe_case_date.py run 2026-08-16.
"""

from __future__ import annotations

import datetime

import duckdb


def _duck():
    con = duckdb.connect()
    con.execute("PRAGMA threads=4")
    con.execute("SET TimeZone='UTC'")
    return con


def test_month_end_saturation_agrees(spark):
    con = _duck()
    s = spark.sql(
        "SELECT CAST(CAST('2024-01-31' AS DATE) + INTERVAL 1 MONTH AS DATE) AS a,"
        " CAST(CAST('2024-02-29' AS DATE) + INTERVAL 1 YEAR AS DATE) AS b,"
        " add_months(CAST('2024-01-31' AS DATE), 1) AS c,"
        " last_day(CAST('2024-02-03' AS DATE)) AS d"
    ).collect()[0]
    d = con.execute(
        "SELECT CAST(CAST('2024-01-31' AS DATE) + INTERVAL 1 MONTH AS DATE),"
        " CAST(CAST('2024-02-29' AS DATE) + INTERVAL 1 YEAR AS DATE),"
        " CAST(CAST('2024-01-31' AS DATE) + INTERVAL 1 MONTH AS DATE),"
        " last_day(CAST('2024-02-03' AS DATE))"
    ).fetchone()
    assert tuple(s) == d == (
        datetime.date(2024, 2, 29),
        datetime.date(2025, 2, 28),
        datetime.date(2024, 2, 29),
        datetime.date(2024, 2, 29),
    )


def test_datediff_day_pair_and_week_trunc_agree(spark):
    con = _duck()
    s = spark.sql(
        "SELECT datediff(CAST('2024-03-01' AS DATE),"
        " CAST('2024-01-31' AS DATE)) AS d,"
        " CAST(date_trunc('week', TIMESTAMP '2024-01-04 10:00:00') AS DATE) AS w"
    ).collect()[0]
    dd, dw = con.execute(
        "SELECT datediff('day', CAST('2024-01-31' AS DATE),"
        " CAST('2024-03-01' AS DATE)),"
        " CAST(date_trunc('week', TIMESTAMP '2024-01-04 10:00:00') AS DATE)"
    ).fetchone()
    assert s.d == dd == 30
    assert s.w == dw == datetime.date(2024, 1, 1)  # Monday-start both


def test_dayofweek_numbering_is_a_dialect(spark):
    """Sunday: Spark 1, DuckDB 0 — constant off-by-one discriminator."""
    con = _duck()
    s = spark.sql(
        "SELECT dayofweek(CAST('2024-01-07' AS DATE)) AS d,"
        " extract(DOW FROM CAST('2024-01-07' AS DATE)) AS e"
    ).collect()[0]
    assert (s.d, s.e) == (1, 1)
    d = con.execute(
        "SELECT dayofweek(CAST('2024-01-07' AS DATE)),"
        " extract(DOW FROM CAST('2024-01-07' AS DATE))"
    ).fetchone()
    assert d == (0, 0)
    # the oracle spelling for Spark's dayofweek:
    assert con.execute(
        "SELECT dayofweek(CAST('2024-01-07' AS DATE)) + 1"
    ).fetchone()[0] == s.d


def test_months_between_has_no_duckdb_pair(spark):
    """Spark: 31-day-based fraction; DuckDB datediff('month'):
    boundary count. Agree on exact anniversaries only — pinned on a
    non-anniversary so nobody pairs them."""
    s = spark.sql(
        "SELECT months_between(CAST('2024-02-15' AS DATE),"
        " CAST('2024-01-31' AS DATE)) AS m"
    ).collect()[0].m
    d = _duck().execute(
        "SELECT datediff('month', CAST('2024-01-31' AS DATE),"
        " CAST('2024-02-15' AS DATE))"
    ).fetchone()[0]
    assert abs(s - 0.48387097) < 1e-6
    assert d == 1
