"""The double->string cross-engine contract (round 13).

The r13 probe compared every way of rendering a DOUBLE as text across
Spark and DuckDB and found that EVERY decimal route is a per-engine
dialect:

1. native cast: Spark emits Java's ``Double.toString`` — scientific
   notation from 1e7 / below 1e-3 spelled ``1.0E7``, specials
   ``Infinity``/``NaN`` — while DuckDB emits C-style shortest with a
   much higher sci threshold (``10000000.0``; ``1e+16``; ``inf``/
   ``nan``). Divergent on 14 of 26 battery doubles.
2. ``printf('%.17e')``: Java 17 formats from the SHORTEST decimal
   repr zero-padded; C/fmt from the true binary expansion
   (``0.1`` -> ``1.00000000000000000e-01`` vs ``...006e-01``).
3. ``CAST(v AS DECIMAL(38,12))``: Spark quantizes via the shortest
   repr digits (Scala ``BigDecimal(double)`` routes through
   ``Double.toString``), DuckDB via the exact binary value —
   733/840 of the probe battery diverged
   (``131072.0001220703`` -> ``...070300`` vs ``...070320``).

The one shared EXACT channel is C99 hex-float ``%a``: the IEEE-754
bits verbatim, no binary->decimal conversion anywhere, and both
engines implement it. The only differences are cosmetic (Java
``0x1.0p0``/bare exponent vs C ``0x1p+0``; special spellings), which
``portable_double_repr`` normalizes with two regexes
(functions/numeric.py — the engine side; ``oracle_double_repr`` is
the DuckDB twin).

These tests pin:

1. the native-cast divergence discriminator (if engines ever agree,
   the contract can be retired),
2. the portable repr's cross-engine EQUALITY on the hostile battery
   plus 20k seeded random bit patterns (subnormals, huge, tiny,
   every exponent regime),
3. injectivity (distinct doubles -> distinct strings, including
   -0.0 vs 0.0) and NULL propagation,
4. the consumer: ``row_hash`` digests agree across engines on a
   frame whose double column spans the regimes the naive cast broke
   on (>= 1e7, < 1e-3, negative, specials, null) — the q_table_diff
   docstring's "two different engines reconcile" promise, previously
   true only inside the plain-notation window [1e-3, 1e7).
"""

from __future__ import annotations

import math
import random
import struct

import duckdb
import pytest
from pyspark.sql import functions as F

from pipeline_airflow_docker_spark.functions.numeric import (
    oracle_double_repr,
    portable_double_repr,
)

# Every double-rendering regime: plain window, both sci regimes, both
# engines' threshold boundaries, denormals, extremes, signed zero,
# exact dyadics, decimal-tie dyadics (odd/2^13), specials.
BATTERY = [
    0.0, -0.0, 1.0, -1.0, 0.5, 0.1, 1.0 / 3.0, 123456.789,
    999999.9999, 1e6, 1e7 - 0.001, 1e7, 12345678.0, 1e15, 1e16,
    1.23e16, 1e21, 1e-3, 1e-4, 1e-5, 1e-300, 5e-324, -5e-324,
    4.9406564584124654e-310, 2.2250738585072014e-308,
    1.7976931348623157e308, -1.7976931348623157e308,
    0.0001220703125, 131072.0001220703, 1 / 8192, -1 / 8192,
    math.pi, -math.e, 1e24, -1e24,
    float("inf"), float("-inf"), float("nan"),
]


def _spark_native(spark, vals):
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "i int, v double"
    )
    return {
        r.i: r.s
        for r in df.select("i", F.col("v").cast("string").alias("s")).collect()
    }


def test_native_cast_still_diverges(spark):
    """Discriminator: the naive cast IS a dialect split. If this ever
    passes 0 divergences, the engines converged and the %a contract
    can be reconsidered."""
    vals = [v for v in BATTERY if v == v]  # NaN compares unequal to itself
    s = _spark_native(spark, vals)
    con = duckdb.connect()
    n_div = 0
    for i, v in enumerate(vals):
        d = con.execute("SELECT CAST(CAST(? AS DOUBLE) AS VARCHAR)", [v]).fetchone()[0]
        if s[i] != d:
            n_div += 1
    assert n_div >= 10, f"native double->string divergence shrank to {n_div}"
    # the class that broke row_hash's cross-engine promise:
    assert s[vals.index(1e7)] == "1.0E7"
    assert con.execute("SELECT CAST(1e7 AS VARCHAR)").fetchone()[0] == "10000000.0"


def _portable_both(spark, vals):
    """(spark_strings, duckdb_strings) for a list of doubles, bulk."""
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "i int, v double"
    )
    s = {
        r.i: r.s
        for r in df.select(
            "i", portable_double_repr("v").alias("s")
        ).collect()
    }
    con = duckdb.connect()
    con.register("t", df.toArrow())
    d = dict(
        con.execute(
            f"SELECT i, {oracle_double_repr('v')} FROM t"
        ).fetchall()
    )
    return s, d


def test_portable_repr_agrees_on_battery(spark):
    s, d = _portable_both(spark, BATTERY)
    for i, v in enumerate(BATTERY):
        assert s[i] == d[i], f"v={v!r}: spark={s[i]!r} duckdb={d[i]!r}"
    # canonical spellings pinned (C-style)
    assert s[BATTERY.index(1e7)] == "0x1.312dp+23"
    assert s[BATTERY.index(float("inf"))] == "inf"
    assert s[BATTERY.index(1.0)] == "0x1p+0"
    # signed zero survives — the repr is injective even where == isn't
    assert s[1] == "-0x0p+0" and s[0] == "0x0p+0"


def test_portable_repr_agrees_on_random_bits(spark):
    """20k seeded random 64-bit patterns: every exponent regime,
    subnormals, and both signs. NaN patterns are excluded (all map to
    'nan' by contract, pinned above)."""
    rng = random.Random(13)
    vals = []
    while len(vals) < 20000:
        v = struct.unpack("<d", struct.pack("<Q", rng.getrandbits(64)))[0]
        if v == v and abs(v) != float("inf"):
            vals.append(v)
    s, d = _portable_both(spark, vals)
    bad = [(vals[i], s[i], d[i]) for i in s if s[i] != d[i]]
    assert not bad, f"{len(bad)} divergences, first: {bad[:3]}"
    # injectivity: distinct bit patterns -> distinct strings
    uniq_vals = {struct.pack("<d", v) for v in vals}
    uniq_strs = {s[i] for i in s}
    assert len(uniq_strs) == len(uniq_vals)


def test_portable_repr_null_and_float32(spark):
    df = spark.createDataFrame(
        [(0, None, None), (1, 0.1, 0.1), (2, 1e7, 1e7)],
        "i int, v double, f float",
    )
    rows = {
        r.i: (r.s, r.sf)
        for r in df.select(
            "i",
            portable_double_repr("v").alias("s"),
            portable_double_repr("f").alias("sf"),
        ).collect()
    }
    assert rows[0] == (None, None)
    # float32 0.1 widens exactly to its own (different) double
    assert rows[1][0] == "0x1.999999999999ap-4"
    assert rows[1][1] == "0x1.99999ap-4"
    con = duckdb.connect()
    assert (
        con.execute(
            f"SELECT {oracle_double_repr('CAST(0.1 AS FLOAT)')}"
        ).fetchone()[0]
        == rows[1][1]
    )


def test_row_hash_reconciles_across_engines(spark):
    """End-to-end consumer check: md5 row digests computed by Spark's
    row_hash equal DuckDB's replay on a frame whose double column
    spans the regimes the naive cast diverged on."""
    from pipeline_airflow_docker_spark.operators.reconcile import row_hash

    rows = [
        (1, 1e7, "a"), (2, 12345678.5, "b"), (3, 1e-4, "c"),
        (4, -0.0, "d"), (5, float("nan"), "e"), (6, float("inf"), "f"),
        (7, None, "g"), (8, 123.45, "h"), (9, 1.7976931348623157e308, "i"),
    ]
    df = spark.createDataFrame(rows, "k int, v double, s string")
    got = {
        r.k: r.h
        for r in df.select("k", row_hash(df, ["v", "s"]).alias("h")).collect()
    }
    con = duckdb.connect()
    con.register("t", df.toArrow())
    want = dict(
        con.execute(
            "SELECT k, md5(concat_ws(chr(31),"
            f" COALESCE({oracle_double_repr('v')}, chr(0) || '∅'),"
            " COALESCE(s, chr(0) || '∅'))) FROM t"
        ).fetchall()
    )
    assert got == want


def test_nonfinite_double_to_decimal_is_an_engine_boundary(spark):
    """r14 probe: outside dec()'s finite input domain the engines
    split three ways — Spark (ansi off) silently NULLs NaN, Inf, AND
    decimal-overflow (so decimal SUMs skip them); DuckDB CAST raises
    on all three; DuckDB TRY_CAST catches overflow (NULL) but STILL
    raises on NaN. Pinned as discriminators so a change in either
    engine resurfaces the domain question. sum(double) with NaN
    agrees (NaN) — the split is decimal-only."""
    row = spark.sql(
        "SELECT CAST(CAST('NaN' AS DOUBLE) AS DECIMAL(18,4)) AS a,"
        " CAST(CAST('Infinity' AS DOUBLE) AS DECIMAL(18,4)) AS b,"
        " CAST(CAST(1e30 AS DOUBLE) AS DECIMAL(18,4)) AS c"
    ).collect()[0]
    assert (row.a, row.b, row.c) == (None, None, None)
    con = duckdb.connect()
    for sql in (
        "SELECT CAST(CAST('NaN' AS DOUBLE) AS DECIMAL(18,4))",
        "SELECT CAST(CAST('Infinity' AS DOUBLE) AS DECIMAL(18,4))",
        "SELECT CAST(CAST(1e30 AS DOUBLE) AS DECIMAL(18,4))",
        "SELECT TRY_CAST(CAST('NaN' AS DOUBLE) AS DECIMAL(18,4))",
    ):
        try:
            con.execute(sql)
            raise AssertionError(f"DuckDB now accepts: {sql} — re-probe")
        except (duckdb.ConversionException, duckdb.InvalidInputException):
            pass
    assert con.execute(
        "SELECT TRY_CAST(CAST(1e30 AS DOUBLE) AS DECIMAL(18,4))"
    ).fetchone()[0] is None
    # double SUM with NaN agrees — the split is the decimal door only
    s = spark.sql(
        "SELECT SUM(v) AS s FROM (VALUES (CAST('NaN' AS DOUBLE)),"
        " (CAST(1.5 AS DOUBLE))) AS t(v)"
    ).collect()[0].s
    d = con.execute(
        "SELECT SUM(v) FROM (VALUES (CAST('NaN' AS DOUBLE)),"
        " (CAST(1.5 AS DOUBLE))) AS t(v)"
    ).fetchone()[0]
    assert math.isnan(s) and math.isnan(d)


def test_row_hash_resolves_columns_case_insensitively(spark):
    """r13 ADVICE: Spark resolves column references case-insensitively
    by default, so the DOUBLE-detection lookup must too — an
    exact-match dict would silently route 'V' (schema: 'v' DOUBLE)
    through the native string cast, reviving the per-engine dialect.
    And a name matching nothing must raise, never silently fall back."""
    from pipeline_airflow_docker_spark.operators.reconcile import row_hash

    df = spark.createDataFrame([(1, 1e7)], "k int, v double")
    # 1e7 is exactly where native Spark rendering goes sci-notation:
    # the %a route and the native-cast route produce different digests.
    exact = df.select(row_hash(df, ["v"]).alias("h")).collect()[0].h
    cased = df.select(row_hash(df, ["V"]).alias("h")).collect()[0].h
    assert cased == exact
    with pytest.raises(ValueError, match="not found"):
        row_hash(df, ["nope"])


def test_row_hash_rejects_ambiguous_casefold_collision(spark):
    """Two fields differing only in case: exact names still work,
    a third casing raises rather than guessing which type to use."""
    from pipeline_airflow_docker_spark.operators.reconcile import row_hash

    saved = spark.conf.get("spark.sql.caseSensitive")
    spark.conf.set("spark.sql.caseSensitive", "true")
    try:
        df = spark.createDataFrame([(1.5, "x")], "val double, VAL string")
        assert df.select(
            row_hash(df, ["val"]).alias("a"), row_hash(df, ["VAL"]).alias("b")
        ).collect()
        with pytest.raises(ValueError, match="ambiguous"):
            row_hash(df, ["Val"])
    finally:
        # Restore the value saved above, not a hardcoded default —
        # brittle otherwise if the shared fixture ever changes the
        # conf (r14 ADVICE).
        spark.conf.set("spark.sql.caseSensitive", saved)
