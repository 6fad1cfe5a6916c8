"""The timestamp<->numeric cast cross-engine contract (round 14).

The r14 probe compared every route between TIMESTAMP and DOUBLE/
DECIMAL epoch values across Spark and DuckDB:

1. **The integer-microsecond channel AGREES exactly** — Spark
   ``unix_micros``/``timestamp_micros`` vs DuckDB ``epoch_us``/
   ``make_timestamp(BIGINT)`` — including pre-epoch negatives
   (-1 us -> 1969-12-31 23:59:59.999999 both). This is the portable
   conversion channel, the timestamp twin of the %a double channel
   (SCALE.md §18).
2. **ts -> double seconds agrees as a PAIR, not a spelling**:
   Spark ``CAST(ts AS DOUBLE)`` == DuckDB ``epoch(ts)`` exactly,
   fractional microseconds included, out to the int64-microsecond
   edge (2262-04-11 -> 9223372036.854776 both). DuckDB has no
   ``CAST(TIMESTAMP AS DOUBLE)`` / ``AS DECIMAL`` (conversion
   error), so any oracle must spell the DuckDB side ``epoch(..)``.
3. **double -> timestamp is a DIALECT on sub-microsecond input**:
   Spark ``CAST(DOUBLE AS TIMESTAMP)`` TRUNCATES toward zero at the
   microsecond (1.0000015 s -> ...1.000001; -1.0000015 ->
   ...58.999999 = -1.000001); DuckDB ``to_timestamp()`` ROUNDS to
   nearest (-> ...1.000002 / ...58.999998). Identical only when the
   input is an exact microsecond multiple. Graded plans therefore
   never parse doubles into timestamps: data-derived stamps go
   through ``timestamp_seconds(BIGINT)`` (reference_ops.py:249) or
   the integer-us channel, both exact.
4. Spark's ts->DECIMAL(20,6) works (exact us as a decimal); DuckDB
   refuses the cast — a graded DECIMAL epoch would need
   ``CAST(epoch_us(ts) AS DECIMAL(20,6)) / 1000000`` as the oracle
   spelling. No graded key currently emits a decimal epoch.

Probe provenance: /tmp/probe_r14.py run 2026-08-16; SCALE.md §21.
"""

from __future__ import annotations

import duckdb

EDGE_MICROS = [
    0,
    1,
    -1,
    1_704_164_645_123_456,     # 2024-01-02 03:04:05.123456
    -62_135_596_800_000_000,   # year 1 AD
    9_223_372_036_854_775,     # near the double-seconds precision edge
]


def _duck():
    con = duckdb.connect()
    con.execute("PRAGMA threads=4")
    con.execute("SET TimeZone='UTC'")
    return con


def test_integer_micros_channel_is_exact_both_ways(spark):
    con = _duck()
    for us in EDGE_MICROS:
        s = spark.sql(
            f"SELECT CAST(timestamp_micros({us}) AS STRING) AS ts,"
            f" unix_micros(timestamp_micros({us})) AS us"
        ).collect()[0]
        d_ts, d_us = con.execute(
            f"SELECT CAST(make_timestamp(CAST({us} AS BIGINT)) AS VARCHAR),"
            f" epoch_us(make_timestamp(CAST({us} AS BIGINT)))"
        ).fetchone()
        assert s.us == d_us == us
        assert s.ts == d_ts, (us, s.ts, d_ts)


def test_ts_to_double_seconds_pair_agrees_exactly(spark):
    """Spark CAST(ts AS DOUBLE) == DuckDB epoch(ts), bit-exact,
    fractional micros included, out to the int64-us edge."""
    import struct

    con = _duck()
    for lit in (
        "2024-01-02 03:04:05.123456",
        "1969-12-31 23:59:59.999999",
        "2262-04-11 23:47:16.854775",
        "1970-01-01 00:00:00",
    ):
        s = spark.sql(
            f"SELECT CAST(TIMESTAMP '{lit}' AS DOUBLE) AS d"
        ).collect()[0].d
        d = con.execute(f"SELECT epoch(TIMESTAMP '{lit}')").fetchone()[0]
        assert struct.pack("<d", s) == struct.pack("<d", d), (lit, s, d)


def test_duckdb_refuses_direct_ts_numeric_casts(spark):
    """The pair is CAST(ts AS DOUBLE) <-> epoch(ts); DuckDB's direct
    casts don't exist. If DuckDB ever adds them, re-probe rounding."""
    con = _duck()
    for sql in (
        "SELECT CAST(TIMESTAMP '2024-01-02 03:04:05' AS DOUBLE)",
        "SELECT CAST(TIMESTAMP '2024-01-02 03:04:05' AS DECIMAL(20,6))",
        "SELECT CAST(CAST(1.5 AS DOUBLE) AS TIMESTAMP)",
    ):
        try:
            con.execute(sql)
            raise AssertionError(f"DuckDB now implements: {sql} — re-probe")
        except duckdb.ConversionException:
            pass
    # ...while Spark implements all three
    row = spark.sql(
        "SELECT CAST(TIMESTAMP '2024-01-02 03:04:05' AS DOUBLE) AS a,"
        " CAST(TIMESTAMP '2024-01-02 03:04:05' AS DECIMAL(20,6)) AS b,"
        " CAST(CAST(1.5 AS DOUBLE) AS TIMESTAMP) AS c"
    ).collect()[0]
    assert row.a == 1704164645.0 and str(row.b) == "1704164645.000000"


def test_double_to_ts_submicro_rounding_is_a_dialect(spark):
    """Discriminator: Spark truncates toward zero at the microsecond,
    DuckDB rounds to nearest. Pinned on both signs. If either engine
    changes, re-evaluate the no-double-parse rule."""
    con = _duck()
    s = spark.sql(
        "SELECT CAST(CAST(1.0000015 AS DOUBLE) AS TIMESTAMP) AS a,"
        " CAST(CAST(-1.0000015 AS DOUBLE) AS TIMESTAMP) AS b"
    ).collect()[0]
    assert s.a.microsecond == 1, s.a          # 1.0000015 -> trunc .000001
    assert s.b.microsecond == 999999, s.b     # -1.0000015 -> trunc -1.000001
    da, db = con.execute(
        "SELECT to_timestamp(1.0000015), to_timestamp(-1.0000015)"
    ).fetchone()
    assert da.microsecond == 2, da            # round-to-nearest .000002
    assert db.microsecond == 999998, db       # -1.000002
    # Exact microsecond multiples agree (the only safe double input):
    s2 = spark.sql(
        "SELECT CAST(CAST(1.000002 AS DOUBLE) AS TIMESTAMP) AS a"
    ).collect()[0].a
    d2 = con.execute("SELECT to_timestamp(1.000002)").fetchone()[0]
    assert s2.microsecond == d2.microsecond == 2
