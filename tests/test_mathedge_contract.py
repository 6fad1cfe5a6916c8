"""The math-function edge + double-literal cross-engine contract
(round 14).

Three probe batteries (out-of-domain inputs; 512-value positive-domain
bit comparison; literal-parse isolation) found:

OUT-OF-DOMAIN is a DIALECT (Spark ansi-off returns NULL or NaN,
DuckDB raises):
1. ln/log2/log10 of 0 or negative: Spark NULL, DuckDB OutOfRange.
   Every log-using graded key has a strictly-positive argument by
   construction (A-ES: (h32+0.5)/2^32 > 0; entropy/PMI: counts >= 1;
   Zipf: ranks/freqs >= 1) — pinned here so a new key can't assume
   the engines agree at the boundary.
2. log(1, x): Spark +Inf (ln x / ln 1), DuckDB raises.
3. sqrt(-1) / asin(2): Spark NaN, DuckDB raises.
4. sign(NaN): Spark NaN, DuckDB 0. sign(-0.0) agrees (0).
5. abs(INT64_MIN): Spark WRAPS (stays negative, ansi off), DuckDB
   raises — the companion of the r13 `INT64_MIN div -1` pin.
6. CAST(double AS INT): Spark TRUNCATES (2.7 -> 2), DuckDB ROUNDS
   (2.7 -> 3) — the discriminator behind q_histogram's
   floor-then-divide bin design (plans/dataops.py).

TRANSCENDENTALS ARE NOT BIT-REPRODUCIBLE across engines on the legal
domain: on a 512-value battery with bit-identical inputs, ln diverged
on 8 values by 1 ulp (including ln(3.0)), log2 on ~40%, sin/cos on
large arguments by up to ~1e-8 relative (different argument
reduction); exp/atan/sqrt agreed everywhere (sqrt is IEEE
correctly-rounded; its apparent diffs were literal-parse diffs, see
below). CONTRACT: any transcendental feeding an oracle-compared
column must be quantized first — round(..., 6..9) or a decimal grid —
which every graded key already does (A-ES rounds to 9dp, entropy and
PMI to 6dp, kmeans snaps to a grid).

DOUBLE-LITERAL PARSING is itself a dialect: DuckDB parses a plain
decimal literal as DECIMAL and converts — 1 ulp off true nearest on
~10% of 17-significant-digit values — while Spark's literal->double
matches strtod/Python exactly. DuckDB's E-NOTATION literals and
string casts are both correctly rounded (0/502 diffs). RULE: oracle
SQL spells any high-precision double constant in e-notation or as a
string cast; current graded oracles carry no >=12-fractional-digit
literals (grep census this round). Fuzz measures (<=4dp, < 1e9) are
exact through either path: a 4dp decimal under 1e9 is an exact
integer numerator over 10^4, one correctly-rounded double division.

Probe provenance: /tmp/probe_math.py, probe_lnexact.py,
probe_litparse.py run 2026-08-16; SCALE.md §21 addendum.
"""

from __future__ import annotations

import struct

import duckdb


def _duck():
    con = duckdb.connect()
    con.execute("PRAGMA threads=4")
    return con


def _bits(v: float) -> bytes:
    return struct.pack("<d", v)


def test_out_of_domain_math_is_a_dialect(spark):
    s = spark.sql(
        "SELECT ln(0.0) AS a, ln(-1.0) AS b, log2(0.0) AS c,"
        " sqrt(-1.0) AS d, asin(2.0) AS e, log(1, 5.0) AS f"
    ).collect()[0]
    assert (s.a, s.b, s.c) == (None, None, None)
    assert str(s.d) == "nan" and str(s.e) == "nan"
    assert s.f == float("inf")
    con = _duck()
    for sql, exc in (
        ("SELECT ln(0.0)", duckdb.OutOfRangeException),
        ("SELECT ln(-1.0)", duckdb.OutOfRangeException),
        ("SELECT log2(0.0)", duckdb.OutOfRangeException),
        ("SELECT sqrt(-1.0)", duckdb.OutOfRangeException),
        ("SELECT asin(2.0)", duckdb.InvalidInputException),
        ("SELECT log(1, 5.0)", duckdb.OutOfRangeException),
    ):
        try:
            con.execute(sql)
            raise AssertionError(f"DuckDB now accepts: {sql} — re-probe")
        except exc:
            pass


def test_sign_nan_abs_intmin_and_double_to_int_dialects(spark):
    s = spark.sql(
        "SELECT sign(CAST('NaN' AS DOUBLE)) AS a,"
        " abs(CAST(-9223372036854775808 AS BIGINT)) AS b,"
        " CAST(CAST(2.7 AS DOUBLE) AS INT) AS c,"
        " CAST(CAST(-2.7 AS DOUBLE) AS INT) AS d"
    ).collect()[0]
    assert str(s.a) == "nan"
    assert s.b == -9223372036854775808          # non-ANSI wrap
    assert (s.c, s.d) == (2, -2)                # truncation
    con = _duck()
    assert con.execute(
        "SELECT sign(CAST('NaN' AS DOUBLE))"
    ).fetchone()[0] == 0
    try:
        con.execute("SELECT abs(CAST(-9223372036854775808 AS BIGINT))")
        raise AssertionError("DuckDB abs(INT64_MIN) no longer raises")
    except duckdb.OutOfRangeException:
        pass
    assert con.execute(
        "SELECT CAST(CAST(2.7 AS DOUBLE) AS INT),"
        " CAST(CAST(-2.7 AS DOUBLE) AS INT)"
    ).fetchone() == (3, -3)                     # round-to-nearest


def test_math_agreement_points(spark):
    con = _duck()
    q = ("SELECT power(0.0, 0.0) AS a, power(-8.0, 0.3333333333333333) AS b,"
         " power(-2.0, 2.0) AS c, exp(1000.0) AS d, exp(-1000.0) AS e,"
         " cbrt(-8.0) AS f, sqrt(2.25) AS g")
    s = spark.sql(q).collect()[0]
    d = con.execute(q).fetchone()
    assert s.a == d[0] == 1.0
    assert str(s.b) == str(d[1]) == "nan"
    assert (s.c, s.d, s.e, s.f, s.g) == tuple(d[2:]) == (
        4.0, float("inf"), 0.0, -2.0, 1.5
    )


def test_transcendentals_require_quantization_discriminator(spark):
    """ln(3.0) differs by 1 ulp across engines TODAY (Java Math.log
    vs libm); after round(.., 9) they agree. If this discriminator
    ever finds bit-equality, re-probe the full battery — the
    quantize-before-compare rule might be relaxable."""
    s = spark.sql("SELECT ln(3.0) AS v, round(ln(3.0), 9) AS r").collect()[0]
    d = _duck().execute("SELECT ln(3.0), round(ln(3.0), 9)").fetchone()
    assert _bits(s.v) != _bits(d[0]), (
        "ln(3.0) is now bit-identical across engines — re-probe the "
        "512-value battery before relaxing the quantization rule"
    )
    assert abs(s.v - d[0]) < 1e-15              # 1 ulp, not a real gap
    assert _bits(s.r) == _bits(d[1])            # quantized: identical


def test_duckdb_double_literal_parse_dialect(spark):
    """A 17-digit plain literal parses 1 ulp off in DuckDB (DECIMAL
    route); e-notation and string casts are correctly rounded; Spark
    matches Python/strtod on all spellings."""
    v = 101001429.40972911
    con = _duck()
    lit = con.execute(f"SELECT CAST({v!r} AS DOUBLE)").fetchone()[0]
    assert _bits(lit) != _bits(v), (
        "DuckDB's plain-literal parse is now correctly rounded — the "
        "e-notation oracle-spelling rule can be relaxed after a re-probe"
    )
    en = con.execute(f"SELECT CAST({v:.17e} AS DOUBLE)").fetchone()[0]
    sc = con.execute(f"SELECT CAST('{v!r}' AS DOUBLE)").fetchone()[0]
    assert _bits(en) == _bits(sc) == _bits(v)
    s = spark.sql(f"SELECT CAST({v!r} AS DOUBLE) AS a").collect()[0].a
    assert _bits(s) == _bits(v)
