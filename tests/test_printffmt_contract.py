"""The printf/format-family cross-engine contract (round 15,
session 2).

The %a portable-double channel (functions/numeric.py::
portable_double_repr / oracle_double_repr, SCALE.md §18) is BUILT on
this pair — Spark format_string('%a') vs DuckDB printf('%a') — so
the r15 probe ran the whole Java-Formatter-vs-C-printf surface:

**AGREE (the common subset):**
- Integer/string conversions with width, left-align, zero-pad
  (%5d/%-5d/%05d/%10s), %x/%X/%o, thousands grouping %,d,
  positional %1$s, %% literal, int64 max.
- %f default precision (6), %e scientific (same mantissa digits and
  exponent form), and **%a hex-float — including the bit pattern of
  0.1** (the channel's agreement, re-pinned here at the raw printf
  level; the 20k-bit-pattern battery lives in
  test_numrender_contract.py).

**DIALECTS (pinned discriminators):**
- **%.Nf rounding is TWO different algorithms**: Java's Formatter
  rounds the SHORTEST DECIMAL repr of the double HALF_UP, C's printf
  rounds the TRUE BINARY value to-nearest(-even at halves). Exact
  binary halves diverge (%.2f(0.125) '0.13' vs '0.12', %.0f(2.5)
  '3' vs '2'), and so does any value whose shortest repr reads as a
  half while the binary value sits below it (%.1f(0.35): the double
  is 0.34999...97 — C '0.3', Java '0.4'). Agreement only when the
  binary value confirms the printed direction (0.135 -> '0.14'
  both). The graded rounding channel remains round-on-DECIMAL (r14
  battery); %.Nf is NOT portable near decimal halves.
- %g: Java pads to 6 significant digits ('0.000123400'), C strips
  trailing zeros ('0.0001234').
- NULL argument: Java Formatter renders the STRING 'null'; DuckDB
  propagates NULL — the measured fact behind portable_double_repr's
  explicit isNull guard (numeric.py:86).
- format_number is Spark-only (DuckDB's fmt-style format() refuses
  thousand separators for floats in this build).

Census: the ONLY printf surface any oracle uses is the %a channel
(q_table_diff via oracle_double_repr) — enforced below.

Probe provenance: /tmp probe run 2026-08-16; SCALE.md §23.
"""

from __future__ import annotations

import re

import duckdb


def _duck():
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    return con


AGREE_CASES = [
    ("'%d', 42", "42"),
    ("'%5d', 42", "   42"),
    ("'%-5d|', 42", "42   |"),
    ("'%05d', 42", "00042"),
    ("'%10s', 'ab'", "        ab"),
    ("'%x', 255", "ff"),
    ("'%X', 255", "FF"),
    ("'%o', 8", "10"),
    ("'%,d', 1234567", "1,234,567"),
    ("'%1$s-%1$s', 'a'", "a-a"),
    ("'%.2f', CAST(1.5 AS DOUBLE)", "1.50"),
    ("'%f', CAST(1.5 AS DOUBLE)", "1.500000"),
    ("'%e', CAST(12345.678 AS DOUBLE)", "1.234568e+04"),
    ("'%a', CAST(0.1 AS DOUBLE)", "0x1.999999999999ap-4"),
    ("'%d', CAST(9223372036854775807 AS BIGINT)", "9223372036854775807"),
]


def test_printf_common_subset_agrees(spark):
    con = _duck()
    for args, want in AGREE_CASES:
        s = spark.sql(f"SELECT format_string({args}) AS r").collect()[0].r
        d = con.execute(f"SELECT printf({args})").fetchone()[0]
        assert s == d == want, (args, s, d)


def test_decimal_half_rounding_dialect(spark):
    """TWO mechanisms, not one: Java's Formatter rounds the SHORTEST
    DECIMAL repr of the double HALF_UP; C's printf rounds the TRUE
    BINARY value to-nearest (even on exact halves). They diverge (a)
    on binary-exact halves (0.125, 0.25, 2.5 — half-up vs half-even)
    and (b) whenever the shortest repr reads as a half but the binary
    value sits BELOW it: 0.35's double is 0.34999...97 -> C says
    '0.3', Java reads '0.35' and says '0.4'. They AGREE when the
    binary value sits ABOVE the printed half (0.135's double is
    0.13500...0088 -> both '0.14')."""
    con = _duck()
    diverging = [
        ("'%.2f', CAST(0.125 AS DOUBLE)", "0.13", "0.12"),  # exact half
        ("'%.1f', CAST(0.25 AS DOUBLE)", "0.3", "0.2"),     # exact half
        ("'%.0f', CAST(2.5 AS DOUBLE)", "3", "2"),          # exact half
        ("'%.1f', CAST(0.35 AS DOUBLE)", "0.4", "0.3"),     # below half
    ]
    for args, s_want, d_want in diverging:
        s = spark.sql(f"SELECT format_string({args}) AS r").collect()[0].r
        d = con.execute(f"SELECT printf({args})").fetchone()[0]
        assert s == s_want and d == d_want, (args, s, d)
    # binary value above the printed half: both round up, agree
    s = spark.sql(
        "SELECT format_string('%.2f', CAST(0.135 AS DOUBLE)) AS r"
    ).collect()[0].r
    d = con.execute("SELECT printf('%.2f', 0.135::DOUBLE)").fetchone()[0]
    assert s == d == "0.14"


def test_g_trailing_zeros_and_null_arg_dialects(spark):
    con = _duck()
    s = spark.sql(
        "SELECT format_string('%g', CAST(0.0001234 AS DOUBLE)) AS g,"
        " format_string('[%s]', CAST(NULL AS STRING)) AS n"
    ).collect()[0]
    d_g = con.execute(
        "SELECT printf('%g', 0.0001234::DOUBLE)"
    ).fetchone()[0]
    d_n = con.execute(
        "SELECT printf('[%s]', NULL::VARCHAR)"
    ).fetchone()[0]
    assert s.g == "0.000123400" and d_g == "0.0001234"
    assert s.n == "[null]" and d_n is None  # numeric.py:86's rationale


def test_format_number_is_spark_only(spark):
    con = _duck()
    s = spark.sql("SELECT format_number(1234567.891, 2) AS r").collect()[0].r
    assert s == "1,234,567.89"
    try:
        con.execute("SELECT format('{:,.2f}', 1234567.891)")
        raise AssertionError(
            "DuckDB now formats floats with thousand separators — "
            "re-probe for a format_number pair"
        )
    except duckdb.InvalidInputException:
        pass


def test_only_graded_printf_surface_is_the_hexfloat_channel():
    """Census: every printf( in every oracle must be the %a channel
    (oracle_double_repr); format( must not appear at all."""
    from pipeline_airflow_docker_spark import plans  # noqa: PLC0415

    for key, sql in plans.ORACLES.items():
        for m in re.finditer(r"printf\s*\(\s*'([^']*)'", sql, re.I):
            assert m.group(1) == "%a", (key, m.group(1))
        assert not re.search(r"(?<!\w)format\s*\(", sql, re.I), key
        assert "format_number" not in sql.lower(), key
