"""The date_format <-> strftime pattern-pair contract (round 14).

Graded oracles already pair Spark ``date_format`` (Java patterns)
with DuckDB ``strftime`` (C patterns) — reference_ops.py:240 pairs
``yyyy-MM-dd'T'HH:mm:ss`` with ``%Y-%m-%dT%H:%M:%S``. The r14 probe
pinned the full pair table on a modern and an ancient (year 44)
timestamp — every pair below agrees, including day/month NAMES
(English locale both), day-of-year, 12-hour + AM/PM, and the
fractional-second mappings (``SSS`` == ``%g`` milliseconds,
``SSSSSS`` == ``%f`` microseconds; Spark ``S..`` TRUNCATES the
fraction to the pattern width, it does not round).

Literal text rules differ (Java quotes with ``'T'``, C passes
non-% chars through) but render identically once spelled per-engine.

Probe provenance: /tmp/probe_datefmt.py run 2026-08-16.
"""

from __future__ import annotations

import duckdb

PAIRS = [
    ("yyyy", "%Y"), ("yy", "%y"), ("MM", "%m"), ("dd", "%d"),
    ("HH", "%H"), ("hh", "%I"), ("mm", "%M"), ("ss", "%S"),
    ("a", "%p"), ("EEEE", "%A"), ("EEE", "%a"), ("MMMM", "%B"),
    ("MMM", "%b"), ("DDD", "%j"), ("SSS", "%g"), ("SSSSSS", "%f"),
    ("yyyy-MM-dd HH:mm:ss", "%Y-%m-%d %H:%M:%S"),
]
STAMPS = ["2024-03-07 09:05:03.123456", "0044-01-02 23:59:59.999999"]


def test_pattern_pair_table_agrees(spark):
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for lit in STAMPS:
        s = spark.sql(
            "SELECT "
            + ", ".join(
                f"date_format(TIMESTAMP '{lit}', '{sp}') AS c{i}"
                for i, (sp, _) in enumerate(PAIRS)
            )
        ).collect()[0]
        d = con.execute(
            "SELECT "
            + ", ".join(
                f"strftime(TIMESTAMP '{lit}', '{dp}')"
                for _, dp in PAIRS
            )
        ).fetchone()
        assert tuple(s) == d, (lit, tuple(s), d)


def test_literal_text_spelling_pair(spark):
    """Java quotes literals ('T'); C passes them through — the graded
    ISO-8601 pair (reference_ops.py:240), pinned end-to-end."""
    from pyspark.sql import functions as F

    s = (
        spark.sql("SELECT TIMESTAMP '2024-03-07 09:05:03' AS ts")
        .select(F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss").alias("f"))
        .collect()[0].f
    )
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    d = con.execute(
        "SELECT strftime(TIMESTAMP '2024-03-07 09:05:03',"
        " '%Y-%m-%dT%H:%M:%S')"
    ).fetchone()[0]
    assert s == d == "2024-03-07T09:05:03"


def test_fraction_truncates_not_rounds(spark):
    """Spark 'S'-patterns truncate the fraction to the width; pinned
    so nobody pairs 'SS' with a rounded two-digit rendering."""
    s = spark.sql(
        "SELECT date_format(TIMESTAMP '2024-01-01 00:00:00.987654',"
        " 'SS') AS f"
    ).collect()[0].f
    assert s == "98"  # truncation of .987654, not rounding to 99
