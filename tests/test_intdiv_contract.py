"""The modulo / integer-division cross-engine contract (round 13).

The r13 probe ran a signed battery through Spark's ``%`` / ``pmod`` /
``div`` and DuckDB's ``%`` / ``mod()`` / ``//``:

1. ``%`` agrees everywhere: BOTH engines use truncated modulo (result
   carries the DIVIDEND's sign): ``-7 % 3 = -1``, ``7 % -3 = 1``.
2. Integer division agrees everywhere in range: Spark's ``div`` and
   DuckDB's ``//`` BOTH truncate toward zero (``-7 // 3 = -2``, not
   the floored ``-3`` Python produces). DuckDB's ``//`` on BIGINTs is
   NOT Python floor division despite the spelling.
3. ``pmod`` has NO DuckDB twin: DuckDB's ``mod(a, b)`` is its ``%``
   (truncated), so ``pmod(-7, 3) = 2`` but ``mod(-7, 3) = -1``. An
   oracle that spells ``pmod`` as ``%``/``mod`` silently diverges on
   every negative dividend. Graded plans use ``pmod`` only for
   internal salt buckets (operators/skew.py) whose values never
   reach an oracle-compared column.
4. One boundary asymmetry: ``INT64_MIN div -1`` overflows — Spark
   (ansi off) WRAPS to INT64_MIN, DuckDB raises OutOfRange. Any
   graded expression whose divisor can be -1 at INT64_MIN would
   split; none exists (divisors in graded plans are positive
   literals or positive counts).
5. Double ``%`` (fmod) agrees on the full sign matrix.
6. Division by zero yields NULL on both sides for ``%`` and
   integer division (ansi off).
"""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F  # noqa: F401 (battery uses SQL)

PAIRS = [
    (7, 3), (-7, 3), (7, -3), (-7, -3), (0, 3),
    (5, 2), (-5, 2), (5, -2), (-5, -2),
    (2, 7), (-2, 7), (2, -7), (-2, -7),
    (2**63 - 1, 10), (-(2**63), 7), (1, 1), (-1, 1),
]


def _spark_rows(spark, sql_fmt):
    return [
        spark.sql(sql_fmt.format(a=a, b=b)).collect()[0]
        for a, b in PAIRS
    ]


def test_truncated_modulo_and_division_agree(spark):
    con = duckdb.connect()
    for a, b in PAIRS:
        s = spark.sql(
            f"SELECT CAST({a} AS BIGINT) % CAST({b} AS BIGINT) AS m,"
            f" CAST({a} AS BIGINT) div CAST({b} AS BIGINT) AS d"
        ).collect()[0]
        dm, dd = con.execute(
            f"SELECT CAST({a} AS BIGINT) % CAST({b} AS BIGINT),"
            f" CAST({a} AS BIGINT) // CAST({b} AS BIGINT)"
        ).fetchone()
        assert (s.m, s.d) == (dm, dd), (a, b, (s.m, s.d), (dm, dd))
        # and the shared semantic is TRUNCATION, not Python floor:
        want_d = abs(a) // abs(b) * (1 if (a >= 0) == (b >= 0) else -1)
        assert s.d == want_d, (a, b, s.d, want_d)
        assert s.m == a - want_d * b, (a, b)


def test_pmod_has_no_duckdb_twin():
    """Discriminator: DuckDB mod() == % (truncated); pmod is Spark-
    only. If DuckDB ever gains a positive-mod with this name/shape,
    oracles could start using it — until then pmod stays off the
    oracle-compared surface."""
    con = duckdb.connect()
    assert con.execute("SELECT mod(-7, 3), -7 % 3").fetchone() == (-1, -1)


def test_pmod_spark_semantics(spark):
    r = spark.sql(
        "SELECT pmod(-7, 3) AS a, pmod(7, -3) AS b, pmod(-7, -3) AS c"
    ).collect()[0]
    assert (r.a, r.b, r.c) == (2, 1, -1)


def test_int64_min_div_minus_one_boundary(spark):
    """Spark (ansi off) wraps; DuckDB refuses. Pinned so the
    asymmetry is a checked fact, not an assumption."""
    s = spark.sql(
        "SELECT CAST(-9223372036854775808 AS BIGINT) div CAST(-1 AS BIGINT) AS d"
    ).collect()[0]
    assert s.d == -(2**63)
    con = duckdb.connect()
    try:
        con.execute(
            "SELECT CAST(-9223372036854775808 AS BIGINT) // CAST(-1 AS BIGINT)"
        ).fetchone()
        raised = False
    except duckdb.OutOfRangeException:
        raised = True
    assert raised


def test_zero_divisor_null_both(spark):
    s = spark.sql("SELECT 3 % 0 AS m, 3 div 0 AS d").collect()[0]
    assert (s.m, s.d) == (None, None)
    con = duckdb.connect()
    assert con.execute("SELECT 3 % 0, 3 // 0").fetchone() == (None, None)


def test_double_fmod_sign_matrix(spark):
    con = duckdb.connect()
    for a, b in [(7.5, 2.0), (-7.5, 2.0), (7.5, -2.0), (-7.5, -2.0),
                 (-0.5, 2.0)]:
        s = spark.sql(
            f"SELECT CAST({a} AS DOUBLE) % CAST({b} AS DOUBLE) AS m"
        ).collect()[0].m
        d = con.execute(
            f"SELECT CAST({a} AS DOUBLE) % CAST({b} AS DOUBLE)"
        ).fetchone()[0]
        assert repr(s) == repr(d), (a, b, s, d)
