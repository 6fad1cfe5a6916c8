"""The string-ordering cross-engine contract (round 13).

Every ranking/window/top-k/min-max qkey sorts or compares strings
somewhere, so the r13 probe ran a 54-string hostile battery — mixed
case, accents, combining marks, NBSP/ideographic space, control
chars, private-use, U+FFFD, supplementary-plane (emoji, U+10FFFD),
fullwidth forms, ß/ligatures/dotless-i — through ORDER BY, all 1431
pairwise ``<``/``=`` comparisons, and min/max aggregates in BOTH
engines: **zero disagreements**.

Why they agree (and what would break it): Spark's default collation
UTF8_BINARY compares UTF-8 BYTES (UTF8String), and UTF-8 byte order
equals code-point order; DuckDB's default collation is also a memcmp
on UTF-8. The latent hazard is Java's native ``String.compareTo``,
which compares UTF-16 CODE UNITS — there, U+E000..U+FFFF sort ABOVE
supplementary characters (whose surrogates start at 0xD800). An
engine change to UTF-16 semantics would silently reorder every
string sort containing supplementary characters; the discriminating
pair (U+E000 vs U+10000) is pinned below in code-point order.

This is the agreement-pin pattern of the r12 date battery: the pin
documents WHY the 150-key registry can sort strings without a
per-key collation contract, and breaks loudly if an engine upgrade
changes the semantics.
"""

from __future__ import annotations

import itertools

import duckdb
from pyspark.sql import functions as F

BATTERY = [
    "", " ", "  a", "a", "A", "b", "B", "Z", "z", "_", "0", "9",
    "a b", "a\tb", "a\nb", "ab", "aB", "Ab",
    "e", "E", "é", "É", "é",
    "ß", "ss", "SS",
    "ı", "I", "i",
    "ﬀ", "ff",
    " ", " ", "　",
    "\x00", "\x01", "\x1f",
    "", "",
    "�", "￿",
    "\U00010000", "\U0001f600", "\U0010fffd",
    "中文", "Ａ", "ａ",
    "zé", "zz", "z\U0001f600",
    "10", "2", "-1", "+1",
]


def _codepoint_sorted():
    """Python sorts str by code point — the contracted order."""
    return sorted(BATTERY)


def test_order_by_agrees_and_is_codepoint_order(spark):
    df = spark.createDataFrame([(x,) for x in BATTERY], "s string")
    got_spark = [r.s for r in df.orderBy("s").collect()]
    con = duckdb.connect()
    got_duck = [
        r[0]
        for r in con.execute(
            "SELECT s FROM (SELECT unnest(?) AS s) ORDER BY s", [BATTERY]
        ).fetchall()
    ]
    want = _codepoint_sorted()
    assert got_spark == want
    assert got_duck == want


def test_pairwise_comparisons_agree(spark):
    """All 1431 ordered pairs through < and = in both engines, vs
    Python's code-point comparison."""
    pairs = list(itertools.combinations(BATTERY, 2))
    df = spark.createDataFrame(pairs, "a string, b string")
    rows = df.select(
        "a", "b", (F.col("a") < F.col("b")).alias("lt"),
        (F.col("a") == F.col("b")).alias("eq"),
    ).collect()
    con = duckdb.connect()
    for r in rows:
        want_lt, want_eq = r.a < r.b, r.a == r.b
        assert (r.lt, r.eq) == (want_lt, want_eq), (r.a, r.b)
        d_lt, d_eq = con.execute(
            "SELECT ? < ?, ? = ?", [r.a, r.b, r.a, r.b]
        ).fetchone()
        assert (d_lt, d_eq) == (want_lt, want_eq), (r.a, r.b)


def test_supplementary_discriminator_pinned():
    """U+E000 < U+10000 in code-point/UTF-8-byte order; a UTF-16
    code-unit comparator says the opposite. If either engine ever
    flips this, every string sort over supplementary characters
    reorders."""
    con = duckdb.connect()
    assert con.execute("SELECT ? < ?", ["", "\U00010000"]).fetchone()[0]
    # and the UTF-16 hazard is real: Java code-unit order disagrees
    assert not ("".encode("utf-16-le") < "\U00010000".encode("utf-16-le"))


def test_min_max_agree(spark):
    df = spark.createDataFrame([(x,) for x in BATTERY], "s string")
    r = df.select(F.min("s").alias("lo"), F.max("s").alias("hi")).collect()[0]
    con = duckdb.connect()
    lo, hi = con.execute(
        "SELECT min(s), max(s) FROM (SELECT unnest(?) AS s)", [BATTERY]
    ).fetchone()
    want = _codepoint_sorted()
    assert (r.lo, r.hi) == (lo, hi) == (want[0], want[-1])
