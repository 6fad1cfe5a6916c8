"""The INTERVAL-arithmetic cross-engine contract (round 15).

r14 pinned month-end saturation (jan31+1mo -> feb28 both) and the
datediff/DOW calendar dialects; this closes the remaining INTERVAL
surfaces. Both sessions run UTC, so calendar-vs-fixed-duration DST
splits cannot arise — what's left is month math, mixed units, type
promotion, and rendering. The r15 probe:

**AGREE (calendar month math is engine-identical):**
- Month-end clamping AND its consequences: (jan31+1mo)+1mo ->
  mar28 while jan31+2mo -> mar31 (non-associativity preserved
  identically); feb29+1yr -> feb28; mar31-1mo -> feb28; the era edge
  0001-03-31 - 1mo -> 0001-02-28.
- Sequential mixed-unit application: ts + INTERVAL n MONTH +
  INTERVAL m DAY applies month-then-day in both (jan31+1mo-1day ->
  feb27; jan31+1mo+1day -> mar01 across the clamp).
- Sub-day arithmetic: +24h, fractional seconds ('1.5' -> .5s), and
  single-microsecond addition, exact.
- make_interval(y,m,w,d,h,min,s) == to_months/to_days/
  to_microseconds composition, including mixed m+d+s with
  fractional seconds.
- date_add(date, n) == date + n; add_months(d, 1) == d + INTERVAL 1
  MONTH as a VALUE (see promotion dialect below).

**DIALECTS (pinned discriminators):**
- TYPE PROMOTION: Spark's date + year-month interval / add_months
  stays DATE; DuckDB's date + INTERVAL promotes to TIMESTAMP — an
  oracle adding intervals to dates must CAST back to DATE.
- MIXED-UNIT LITERALS: Spark's ANSI split interval types refuse
  MONTH TO DAY literals and month+day interval ADDITION (separate
  YearMonthIntervalType / DayTimeIntervalType); DuckDB's single
  INTERVAL allows both. Portable spelling: sequential `+ INTERVAL n
  MONTH + INTERVAL m DAY` terms (agrees, above).
- ts - ts: Spark yields INTERVAL DAY TO SECOND, DuckDB INTERVAL,
  with different renders ("INTERVAL '1 03:00:00' DAY TO SECOND" vs
  "1 day 03:00:00"); date - date: Spark INTERVAL '3' DAY vs DuckDB
  bare 3. The portable difference channel is integer epoch math:
  unix_micros(a) - unix_micros(b) == epoch_us(a) - epoch_us(b)
  (exact; the timestamp twin of SCALE.md §18's %a rule) or datediff
  for dates (pinned r14).
- INTERVAL RENDERING never reconciles ("INTERVAL '1' MONTH" vs
  "1 month") and DuckDB refuses DAY TO SECOND / YEAR TO MONTH
  qualified literals entirely — no graded key may emit an interval
  column (census below).
- Year-10000 overflow render: Spark '+10000-01-31..' (explicit +),
  DuckDB '10000-01-31..' — consistent with the r13 positive-year
  agreement being scoped to 4-digit years.

Probe provenance: /tmp/probe_interval_r15.py run 2026-08-16;
SCALE.md §22.
"""

from __future__ import annotations

import duckdb
import pytest


def _duck():
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    return con


def _pair(spark, con, expr: str, duck_expr: str | None = None):
    s = spark.sql(f"SELECT CAST({expr} AS STRING) AS r").collect()[0].r
    d = con.execute(
        f"SELECT CAST({duck_expr or expr} AS VARCHAR)"
    ).fetchone()[0]
    return s, d


MONTH_MATH = [
    ("TIMESTAMP '2023-01-31 12:00:00' + INTERVAL 1 MONTH",
     "2023-02-28 12:00:00"),
    ("TIMESTAMP '2023-01-31 12:00:00' + INTERVAL 1 MONTH + INTERVAL 1 MONTH",
     "2023-03-28 12:00:00"),        # clamp is sticky step-by-step...
    ("TIMESTAMP '2023-01-31 12:00:00' + INTERVAL 2 MONTH",
     "2023-03-31 12:00:00"),        # ...but a single 2-month hop isn't
    ("TIMESTAMP '2024-02-29 00:00:00' + INTERVAL 1 YEAR",
     "2025-02-28 00:00:00"),
    ("TIMESTAMP '2023-03-31 00:00:00' - INTERVAL 1 MONTH",
     "2023-02-28 00:00:00"),
    ("TIMESTAMP '0001-03-31 00:00:00' - INTERVAL 1 MONTH",
     "0001-02-28 00:00:00"),
    ("TIMESTAMP '2023-01-31 00:00:00' + INTERVAL 1 MONTH - INTERVAL 1 DAY",
     "2023-02-27 00:00:00"),
    ("TIMESTAMP '2023-01-31 00:00:00' + INTERVAL 1 MONTH + INTERVAL 1 DAY",
     "2023-03-01 00:00:00"),        # month-then-day across the clamp
    ("TIMESTAMP '2024-03-09 23:30:00' + INTERVAL 24 HOUR",
     "2024-03-10 23:30:00"),
    ("TIMESTAMP '2024-01-01 00:00:00' + INTERVAL '1.5' SECOND",
     "2024-01-01 00:00:01.5"),
    ("TIMESTAMP '2024-01-01 00:00:00' + INTERVAL '0.000001' SECOND",
     "2024-01-01 00:00:00.000001"),
]


def test_calendar_month_math_agrees(spark):
    con = _duck()
    for expr, want in MONTH_MATH:
        s, d = _pair(spark, con, expr)
        assert s == d == want, (expr, s, d)


def test_make_interval_composition_pair(spark):
    """make_interval == to_months/to_days/to_microseconds, mixed
    units and fractional seconds included."""
    con = _duck()
    s = spark.sql(
        "SELECT CAST(TIMESTAMP '2023-01-31 00:00:00'"
        " + make_interval(0, 1, 0, 2, 0, 0, 3.5) AS STRING) AS r"
    ).collect()[0].r
    d = con.execute(
        "SELECT CAST(TIMESTAMP '2023-01-31 00:00:00'"
        " + to_months(1) + to_days(2) + to_microseconds(3500000)"
        " AS VARCHAR)"
    ).fetchone()[0]
    assert s == d == "2023-03-02 00:00:03.5"


def test_date_interval_type_promotion_dialect(spark):
    """Spark: date stays DATE under add_months / date_add; DuckDB:
    date + INTERVAL promotes to TIMESTAMP. Oracle spelling for date
    month-shifts is CAST(d + INTERVAL n MONTH AS DATE)."""
    con = _duck()
    s = spark.sql(
        "SELECT CAST(add_months(DATE '2023-01-31', 1) AS STRING) AS r"
    ).collect()[0].r
    assert s == "2023-02-28"
    d_type = con.execute(
        "SELECT typeof(DATE '2023-01-31' + INTERVAL 1 MONTH)"
    ).fetchone()[0]
    assert d_type == "TIMESTAMP"
    d = con.execute(
        "SELECT CAST(CAST(DATE '2023-01-31' + INTERVAL 1 MONTH AS DATE)"
        " AS VARCHAR)"
    ).fetchone()[0]
    assert d == s
    # plain integer day add agrees without casts:
    s2, d2 = _pair(
        spark, con,
        "date_add(DATE '2024-02-28', 2)", "DATE '2024-02-28' + 2",
    )
    assert s2 == d2 == "2024-03-01"


def test_mixed_unit_interval_literals_are_spark_refused(spark):
    """Spark's split interval types refuse MONTH TO DAY literals and
    YM+DT interval addition; DuckDB accepts both. If Spark ever
    unifies them, the sequential-spelling rule can relax."""
    from pyspark.errors import (  # noqa: PLC0415
        AnalysisException,
        ParseException,
    )

    con = _duck()
    with pytest.raises(ParseException):
        spark.sql(
            "SELECT TIMESTAMP '2023-01-31 00:00:00'"
            " + INTERVAL '1 1' MONTH TO DAY"
        ).collect()
    with pytest.raises(AnalysisException):
        spark.sql(
            "SELECT TIMESTAMP '2023-01-31 00:00:00'"
            " + (INTERVAL 1 MONTH + INTERVAL '-1' DAY)"
        ).collect()
    d = con.execute(
        "SELECT CAST(TIMESTAMP '2023-01-31 00:00:00'"
        " + (INTERVAL 1 MONTH + INTERVAL '-1' DAY) AS VARCHAR)"
    ).fetchone()[0]
    # DuckDB's single-interval month-then-day order matches the
    # sequential spelling both engines agree on:
    assert d == "2023-02-27 00:00:00"


def test_ts_difference_portable_channel_is_integer_micros(spark):
    """ts-ts / date-date renders are dialects; the integer-micros
    difference agrees exactly."""
    con = _duck()
    s = spark.sql(
        "SELECT CAST(TIMESTAMP '2024-01-02 03:00:00'"
        " - TIMESTAMP '2024-01-01 00:00:00' AS STRING) AS r,"
        " unix_micros(TIMESTAMP '2024-01-02 03:00:00')"
        " - unix_micros(TIMESTAMP '2024-01-01 00:00:00') AS us,"
        " CAST(DATE '2024-03-01' - DATE '2024-02-27' AS STRING) AS dd"
    ).collect()[0]
    d = con.execute(
        "SELECT CAST(TIMESTAMP '2024-01-02 03:00:00'"
        " - TIMESTAMP '2024-01-01 00:00:00' AS VARCHAR),"
        " epoch_us(TIMESTAMP '2024-01-02 03:00:00')"
        " - epoch_us(TIMESTAMP '2024-01-01 00:00:00'),"
        " CAST(DATE '2024-03-01' - DATE '2024-02-27' AS VARCHAR)"
    ).fetchone()
    assert s.r == "INTERVAL '1 03:00:00' DAY TO SECOND"
    assert d[0] == "1 day 03:00:00"          # render dialect
    assert s.us == d[1] == 97200000000        # portable channel
    assert s.dd == "INTERVAL '3' DAY" and d[2] == "3"  # date-date dialect


def test_duckdb_refuses_qualified_interval_literals(spark):
    """DAY TO SECOND / YEAR TO MONTH literals parse in Spark only —
    plus the render dialect, the reason no graded key may emit an
    interval column."""
    con = _duck()
    s = spark.sql(
        "SELECT CAST(TIMESTAMP '2023-01-31 00:00:00'"
        " + INTERVAL '1-2' YEAR TO MONTH AS STRING) AS r"
    ).collect()[0].r
    assert s == "2024-03-31 00:00:00"
    for frag in ("INTERVAL '1 02:03:04' DAY TO SECOND",
                 "INTERVAL '1-2' YEAR TO MONTH"):
        with pytest.raises(duckdb.ParserException):
            con.execute(f"SELECT {frag}")


def test_no_graded_oracle_emits_interval_values():
    """Census: interval-typed output would hash differently per
    engine (render dialect above). Heuristic scan: no oracle SELECT
    may cast to INTERVAL or subtract raw timestamps/dates outside an
    epoch/datediff wrapper — enforced simply: the token 'interval'
    never reaches an output column alias context. (All current
    oracles pass intervals only INSIDE date arithmetic.)"""
    from pipeline_airflow_docker_spark import plans  # noqa: PLC0415

    for key, sql in plans.ORACLES.items():
        low = sql.lower()
        assert "as interval" not in low and "::interval" not in low, key
