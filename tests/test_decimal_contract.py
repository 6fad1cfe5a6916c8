"""The DECIMAL arithmetic cross-engine contract (round 14).

The r14 probe ran decimal division, multiplication, aggregation,
rounding, down-casting, and rendering through both engines:

AGREEMENTS (pinned):
1. ``round(DECIMAL[, n])`` is HALF-AWAY-FROM-ZERO in BOTH engines
   (2.5 -> 3, 3.5 -> 4, -2.5 -> -3; 0.125 -> 0.13, 0.135 -> 0.14) —
   unlike round(double, n), whose only divergence is the sign of
   zero (SCALE.md §17). Decimal inputs are exact, so there's no
   binary-representation noise either: round-on-decimal is the
   fully portable rounding channel.
2. DECIMAL -> string agrees: scale-preserving, trailing zeros kept
   (``7.0000``), scale-0 renders bare (``5``), sign plain. The r13
   %a channel is needed for DOUBLES only; decimals render portably.
3. Multiplication, SUM, ``%``, and ``/ 0 -> NULL`` (non-ANSI) agree
   in value and rendered scale.

DIALECTS (pinned with discriminators; census: NO graded key touches
any of them):
4. DECIMAL / DECIMAL: Spark returns DECIMAL(38, max(6,...)) with
   HALF_UP quantization; DuckDB returns DOUBLE. Divide doubles (cast
   first) or compare quantized — ``davg`` casts the decimal sum to
   double BEFORE dividing for exactly this reason
   (functions/numeric.py:107).
5. AVG(DECIMAL): Spark DECIMAL(p+4, s+4) quantized; DuckDB DOUBLE.
   Same rule: never aggregate-average a decimal into an
   oracle-compared column; use davg (sum-then-divide as double).
6. CAST to a LOWER scale: Spark rounds HALF_UP (2.45 -> 2.5);
   DuckDB TRUNCATES toward zero (2.45 -> 2.4, 2.55 -> 2.5).
7. ``div`` on decimals: Spark truncates to BIGINT; DuckDB ``//`` on
   decimals is NOT integer division — it returns the full DOUBLE
   quotient (2.333...). The r13 intdiv contract
   (tests/test_intdiv_contract.py) holds for INTEGER operands only.
8. Decimal multiplication OVERFLOW: Spark (ansi off) silent NULL,
   DuckDB raises OutOfRange — the decimal twin of the non-finite
   double->decimal boundary (test_numrender_contract.py).

Probe provenance: /tmp/probe_decimal.py run 2026-08-16.
"""

from __future__ import annotations

from decimal import Decimal

import duckdb


def _duck():
    con = duckdb.connect()
    con.execute("PRAGMA threads=4")
    return con


def test_round_on_decimal_is_half_away_from_zero_in_both(spark):
    q = ("SELECT round(CAST(2.5 AS DECIMAL(10,1))) AS a,"
         " round(CAST(3.5 AS DECIMAL(10,1))) AS b,"
         " round(CAST(-2.5 AS DECIMAL(10,1))) AS c,"
         " round(CAST(0.125 AS DECIMAL(10,3)), 2) AS d,"
         " round(CAST(0.135 AS DECIMAL(10,3)), 2) AS e")
    s = spark.sql(q).collect()[0]
    d = _duck().execute(q).fetchone()
    want = (Decimal("3"), Decimal("4"), Decimal("-3"),
            Decimal("0.13"), Decimal("0.14"))
    assert tuple(s) == d == want


def test_decimal_rendering_agrees_scale_preserving(spark):
    for lit, typ, want in (
        ("7", "DECIMAL(18,4)", "7.0000"),
        ("-1.5", "DECIMAL(10,4)", "-1.5000"),
        ("5", "DECIMAL(10,0)", "5"),
    ):
        s = spark.sql(
            f"SELECT CAST(CAST({lit} AS {typ}) AS STRING) AS s"
        ).collect()[0].s
        d = _duck().execute(
            f"SELECT CAST(CAST({lit} AS {typ}) AS VARCHAR)"
        ).fetchone()[0]
        assert s == d == want, (lit, typ, s, d)


def test_decimal_mult_sum_mod_divzero_agree(spark):
    q = ("SELECT CAST(7 AS DECIMAL(18,4)) * CAST(3 AS DECIMAL(18,4)) AS m,"
         " CAST(7 AS DECIMAL(18,4)) % CAST(3 AS DECIMAL(18,4)) AS r,"
         " CAST(7 AS DECIMAL(18,4)) / CAST(0 AS DECIMAL(18,4)) AS z")
    s = spark.sql(q).collect()[0]
    d = _duck().execute(q).fetchone()
    assert (s.m, s.r, s.z) == d == (
        Decimal("21.00000000"), Decimal("1.0000"), None
    )
    qs = ("SELECT SUM(v) AS s FROM (VALUES (CAST(7 AS DECIMAL(18,4))),"
          " (CAST(3 AS DECIMAL(18,4)))) AS t(v)")
    assert spark.sql(qs).collect()[0].s == _duck().execute(qs).fetchone()[0] \
        == Decimal("10.0000")


def test_decimal_division_and_avg_are_dialects(spark):
    """Discriminators: Spark keeps decimal / and AVG in DECIMAL
    (HALF_UP-quantized); DuckDB returns DOUBLE for both. davg's
    cast-to-double-then-divide exists because of this."""
    q = "SELECT CAST(7 AS DECIMAL(18,4)) / CAST(3 AS DECIMAL(18,4)) AS q"
    s = spark.sql(q)
    assert s.schema["q"].dataType.simpleString() == "decimal(38,20)"
    assert s.collect()[0].q == Decimal("2.33333333333333333333")
    d = _duck().execute(q).fetchone()[0]
    assert isinstance(d, float) and abs(d - 7 / 3) < 1e-15
    qa = ("SELECT AVG(v) AS a FROM (VALUES (CAST(1 AS DECIMAL(18,4))),"
          " (CAST(1 AS DECIMAL(18,4))), (CAST(0 AS DECIMAL(18,4)))) AS t(v)")
    sa = spark.sql(qa).collect()[0].a
    da = _duck().execute(qa).fetchone()[0]
    assert sa == Decimal("0.66666667")          # DECIMAL(22,8), HALF_UP
    assert isinstance(da, float)                # DOUBLE


def test_decimal_downcast_rounding_is_a_dialect(spark):
    """Spark HALF_UP on scale reduction; DuckDB truncates toward
    zero. Exact decimal inputs, so this is pure semantics."""
    q = ("SELECT CAST(CAST(2.45 AS DECIMAL(10,2)) AS DECIMAL(10,1)) AS a,"
         " CAST(CAST(2.55 AS DECIMAL(10,2)) AS DECIMAL(10,1)) AS b,"
         " CAST(CAST(-2.45 AS DECIMAL(10,2)) AS DECIMAL(10,1)) AS c")
    s = spark.sql(q).collect()[0]
    assert tuple(s) == (Decimal("2.5"), Decimal("2.6"), Decimal("-2.5"))
    d = _duck().execute(q).fetchone()
    assert d == (Decimal("2.4"), Decimal("2.5"), Decimal("-2.4"))


def test_integer_division_on_decimals_is_a_dialect(spark):
    """The r13 intdiv contract covers INTEGER operands; on decimals
    Spark `div` truncates to BIGINT while DuckDB `//` returns the
    full DOUBLE quotient."""
    s = spark.sql(
        "SELECT CAST(7 AS DECIMAL(18,4)) div CAST(3 AS DECIMAL(18,4)) AS q"
    ).collect()[0].q
    assert s == 2 and isinstance(s, int)
    d = _duck().execute(
        "SELECT CAST(7 AS DECIMAL(18,4)) // CAST(3 AS DECIMAL(18,4))"
    ).fetchone()[0]
    assert isinstance(d, float) and abs(d - 7 / 3) < 1e-15


def test_decimal_overflow_is_an_engine_boundary(spark):
    """Spark (ansi off) silent NULL on decimal-mult overflow; DuckDB
    raises. Decimal twin of the non-finite double->decimal pin."""
    q = ("SELECT CAST(9.9e18 AS DECIMAL(38,18)) *"
         " CAST(9.9e18 AS DECIMAL(38,18)) AS q")
    assert spark.sql(q).collect()[0].q is None
    try:
        _duck().execute(q)
        raise AssertionError("DuckDB no longer overflows — re-probe")
    except duckdb.OutOfRangeException:
        pass
