"""The cast-grammar probe battery, pinned as a permanent test
(round 11; previously the 25/27-value side-by-side corpora justifying
plans/contracts.py:INT_LITERAL_RE / DOUBLE_LITERAL_RE lived only in
round evidence and docstrings).

The graded contract is not "whatever casts" — it is "matches the
shared grammar, then cast", because raw string->number semantics
diverge across engines (DuckDB rounds '4.5'->5, hex-parses '0x10',
accepts '4_2'; Spark nulls all three). These tests run the FULL probe
corpus through Spark ``try_cast`` and DuckDB ``TRY_CAST`` side by side
and assert:

1. INSIDE each grammar, the engines agree exactly (bit-for-bit for
   doubles, including -0.0, overflow->inf/NULL, and NaN) — so every
   graded key that applies the gate is hash-stable by construction.
2. The gates are NOT vacuous: dozens of corpus values pass each
   grammar, and at least one value OUTSIDE each grammar demonstrably
   diverges between the engines — the reason the gate exists.
"""

from __future__ import annotations

import math
import re
import struct

import duckdb
import pytest

from pyspark.sql import functions as F

from pipeline_airflow_docker_spark.plans.contracts import (
    DOUBLE_LITERAL_RE,
    INT_LITERAL_RE,
)

# The union of every string->numeric shape the r8/r11 probes rolled:
# whitespace envelopes (incl. \x0B vertical tab), signs, leading
# zeros, decimals, exponents, engine-specific literal extensions
# (hex, underscores), overflow at the int32/int64/double boundaries,
# non-ASCII digits, IEEE specials in several spellings, and junk.
CORPUS = [
    "42", " 42 ", "\t7", "\n8", "\x0b9", "\f10", "\r11", "+7", "-7",
    "-0", "07", "007", "0", "+0",
    "4.5", "4.9", "-4.5", "42.", ".5", "-.5", "4.50", "0.0", "-0.0",
    "1e5", "1E5", "1e+5", "1e-5", "1.5e2", "-2.5E-3", "1e", "e5", ".",
    "1e309", "-1e309", "2.5e-320", "1.7976931348623157e308",
    "0x10", "0X10", "4_2", "1_000", "1,000",
    "2147483647", "2147483648", "-2147483648", "-2147483649",
    "9223372036854775807", "9223372036854775808",
    "-9223372036854775808", "-9223372036854775809",
    "9999999999999999999999999",
    "42abc", "abc", "", " ", "  ", "+", "-", "++1", "--1", "+-1",
    "٤٢", "４２", "42 ", "​42",
    "NaN", "nan", "NAN", "-NaN",
    "Infinity", "-Infinity", "+Infinity", "infinity", "Inf", "inf",
    "-inf", "1.0.0", "1..2", "1 2", '"42"', "'42'", "null", "None",
    "true", "false",
]

_INT_RE = re.compile(INT_LITERAL_RE)
_DBL_RE = re.compile(DOUBLE_LITERAL_RE)


def _dbits(v: float | None) -> bytes | None:
    return None if v is None else struct.pack("<d", v)


@pytest.fixture(scope="module")
def engine_casts(spark):
    """(spark_rows, duck_rows): per corpus value, the three try_casts
    in each engine."""
    df = spark.createDataFrame([(i, v) for i, v in enumerate(CORPUS)], "i INT, v STRING")
    srows = {
        r.i: (r.as_int, r.as_big, r.as_dbl)
        for r in df.select(
            "i",
            F.expr("try_cast(v AS INT)").alias("as_int"),
            F.expr("try_cast(v AS BIGINT)").alias("as_big"),
            F.expr("try_cast(v AS DOUBLE)").alias("as_dbl"),
        ).collect()
    }
    con = duckdb.connect()
    try:
        drows = {}
        for i, v in enumerate(CORPUS):
            drows[i] = con.execute(
                "SELECT TRY_CAST(? AS INTEGER), TRY_CAST(? AS BIGINT), "
                "TRY_CAST(? AS DOUBLE)",
                [v, v, v],
            ).fetchone()
    finally:
        con.close()
    return srows, drows


def test_int_grammar_values_cast_identically(engine_casts):
    srows, drows = engine_casts
    gated = [i for i, v in enumerate(CORPUS) if _INT_RE.match(v)]
    assert len(gated) >= 20, "corpus must exercise the gate broadly"
    for i in gated:
        assert srows[i][0] == drows[i][0], (CORPUS[i], "INT", srows[i][0], drows[i][0])
        assert srows[i][1] == drows[i][1], (CORPUS[i], "BIGINT", srows[i][1], drows[i][1])


def test_double_grammar_values_cast_bit_identically(engine_casts):
    srows, drows = engine_casts
    gated = [i for i, v in enumerate(CORPUS) if _DBL_RE.match(v)]
    assert len(gated) >= 30, "corpus must exercise the gate broadly"
    for i in gated:
        s, d = srows[i][2], drows[i][2]
        if s is not None and d is not None and math.isnan(s) and math.isnan(d):
            continue  # NaN payload bits are not part of the contract
        assert _dbits(s) == _dbits(d), (CORPUS[i], "DOUBLE", s, d)


def test_gates_exist_for_a_reason(engine_casts):
    """At least one NON-gated corpus value must diverge between the
    engines per grammar — if the engines ever converge on the whole
    corpus, the gates (and their oracle mirrors) can be retired."""
    srows, drows = engine_casts
    int_div = [
        CORPUS[i]
        for i, v in enumerate(CORPUS)
        if not _INT_RE.match(v) and srows[i][0] != drows[i][0]
    ]
    dbl_div = [
        CORPUS[i]
        for i, v in enumerate(CORPUS)
        if not _DBL_RE.match(v)
        and _dbits(srows[i][2]) != _dbits(drows[i][2])
        and not (
            srows[i][2] is not None
            and drows[i][2] is not None
            and math.isnan(srows[i][2])
            and math.isnan(drows[i][2])
        )
    ]
    assert int_div, "INT gate is vacuous — engines agree on every non-gated value"
    assert dbl_div, "DOUBLE gate is vacuous — engines agree on every non-gated value"
    # The classic divergence classes must stay represented:
    assert "4.5" in int_div or "0x10" in int_div or "4_2" in int_div


def test_grammar_is_subset_of_both_engines_accepting(engine_casts):
    """No gated value may cast to NULL in ONE engine only — inside the
    grammar, acceptance (not just value) must agree, or a gated key's
    NULL counts drift."""
    srows, drows = engine_casts
    for i, v in enumerate(CORPUS):
        if _INT_RE.match(v):
            assert (srows[i][1] is None) == (drows[i][1] is None), (v, "BIGINT null")
        if _DBL_RE.match(v):
            assert (srows[i][2] is None) == (drows[i][2] is None), (v, "DOUBLE null")


# ---------------------------------------------------------------------
# JSON whitespace-only gate (round 12): from_json's NULL-vs-malformed
# line is JACKSON's whitespace skip — exactly {space, \t, \n, \r} —
# while DuckDB's default trim() strips NBSP/ideographic space but NOT
# \t/\n. q_json_roundtrip's oracle ''-gate diverged in BOTH directions
# ('\t'-only: engine NULL, bare-trim oracle '{}'; '\xa0'-only: engine
# '{}', bare-trim oracle NULL) until it was pinned to the JSON set.
# ---------------------------------------------------------------------
_WS_PROBES = [
    "", " ", "\t", "\n", "\r", "\r\n \t",      # JSON ws-only -> NULL
    "\xa0", "\x0b", "\x0c", "　", " \xa0 ",  # not JSON ws -> '{}'
    "﻿{}",                                  # BOM is not JSON ws
]
_JSON_WS_GATE = "trim(?, ' ' || chr(9) || chr(10) || chr(13)) = ''"


def test_json_whitespace_gate_matches_from_json(spark):
    """For every probe: Spark from_json goes NULL iff the oracle's
    JSON-whitespace trim gate fires — the q_json_roundtrip contract."""
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(_WS_PROBES)], "i INT, props STRING"
    )
    srows = {
        r.i: r.v
        for r in df.select(
            "i", F.to_json(F.from_json("props", "k INT")).alias("v")
        ).collect()
    }
    con = duckdb.connect()
    for i, v in enumerate(_WS_PROBES):
        gate = con.execute(f"SELECT {_JSON_WS_GATE}", [v]).fetchone()[0]
        engine_null = srows[i] is None
        assert engine_null == gate, (repr(v), srows[i], gate)
        if not engine_null:
            assert srows[i] == "{}", repr(v)  # malformed path, both engines
    # non-vacuity: DuckDB's bare trim() disagrees with the gate on
    # BOTH sides of the line
    bare_tab, bare_nbsp = con.execute(
        "SELECT trim(chr(9)) = '', trim(chr(160)) = ''"
    ).fetchone()
    assert bare_tab is False and bare_nbsp is True
    con.close()


# ---------------------------------------------------------------------
# Case-mapping domain tripwire (round 12). The divergence itself is
# r7 knowledge: Spark's upper()/lower() is FULL Unicode case mapping
# (JVM == Python: 'ß'->'SS', ligature 'ﬁ'->'FI', final sigma) while
# DuckDB's is SIMPLE 1:1 ('ß'->'ẞ'), pinned engine-side in
# tests/test_functions.py::test_case_mapping_engine_semantics, and
# special-casing code points stay OUT of graded fixtures by contract
# (tools/gen_fuzz_data.py, the _UNI_WORDS note). What was missing is
# enforcement: the exclusion relied on humans remembering the note at
# every token-pool roll. This test regenerates both fixture
# generators' outputs and asserts every character in every VARCHAR
# column still case-maps identically in Python/Spark and DuckDB — a
# roll that introduces 'ß' fails HERE with a pointer, not as a hash
# mismatch in whichever sweep first uppercases it.
# ---------------------------------------------------------------------
def test_fixture_alphabet_stays_inside_case_agreed_domain(tmp_path):
    import os
    import sys as _sys

    from pipeline_airflow_docker_spark.catalog import TABLES
    from tools import gen_degenerate_data, gen_fuzz_data

    fixtures = []
    for mod, argv in (
        (gen_fuzz_data, ["gen", "--seed", "1"]),
        (gen_degenerate_data, ["gen", "--mode", "degen"]),
    ):
        out = str(tmp_path / argv[-1].lstrip("-"))
        _sys.argv, saved = [*argv, "--out", out], _sys.argv
        try:
            mod.main()
        finally:
            _sys.argv = saved
        fixtures.append(out)
    fixtures.append(os.environ.get("SPARK_GRAFT_BASE", "/root/testdata/sf0.001"))

    con = duckdb.connect()
    chars: set[str] = set()
    for fdir in fixtures:
        for t in TABLES:
            pq = os.path.join(fdir, f"{t}.parquet")
            if not os.path.exists(pq):
                continue
            cols = [
                name
                for name, typ, *_ in con.execute(
                    f"DESCRIBE SELECT * FROM '{pq}'"
                ).fetchall()
                if typ == "VARCHAR"
            ]
            for c in cols:
                for (v,) in con.execute(
                    f'SELECT DISTINCT "{c}" FROM \'{pq}\' WHERE "{c}" IS NOT NULL'
                ).fetchall():
                    chars |= set(v)
    chars.discard("\x00")  # DuckDB VARCHAR params reject NUL
    bad = []
    for c in sorted(chars):
        du, dl = con.execute("SELECT upper(?), lower(?)", [c, c]).fetchone()
        if du != c.upper() or dl != c.lower():
            bad.append((c, hex(ord(c)), c.upper(), du, c.lower(), dl))
    # non-vacuity: the divergence the domain excludes is real in both
    # mapping directions (expansion and context-sensitive sigma)
    assert con.execute("SELECT upper('ß')").fetchone()[0] == "ẞ"
    assert con.execute("SELECT lower('ΣΑΣ')").fetchone()[0] == "σασ"
    assert "ΣΑΣ".lower() == "σας"
    con.close()
    assert not bad, (
        f"case-mapping-divergent chars reached the fixture alphabet: {bad!r}"
        " — see the case-mapping domain contract above and the"
        " _UNI_WORDS note in tools/gen_fuzz_data.py"
    )


def test_round_negative_zero_normalization(spark):
    """r12 probe: round(double, n) agrees across engines on every
    decimal-tie battery value EXCEPT the sign of zero — Spark's round
    goes through BigDecimal (no -0, emits +0.0), DuckDB's through
    binary arithmetic (keeps -0.0). The one graded site whose rounded
    argument can be a tiny negative (q_sample_weighted's ln-score as
    h32 -> 2^32) therefore normalizes oracle-side with + 0.0. Pins:
    (1) Spark round never emits -0.0, (2) DuckDB round does (the
    discriminator), (3) + 0.0 restores agreement."""
    import duckdb as _duck
    import struct as _struct

    from pyspark.sql import functions as F

    s = (
        spark.createDataFrame([(-1e-308,), (-2.5e-10,)], "v double")
        .select(F.round("v", 9).alias("r"))
        .collect()
    )
    for r in s:
        assert _struct.pack("d", r.r) == _struct.pack("d", 0.0), r.r
    con = _duck.connect()
    raw = con.execute("SELECT round(CAST(-1e-308 AS DOUBLE), 9)").fetchone()[0]
    assert _struct.pack("d", raw) == _struct.pack("d", -0.0), (
        "DuckDB round no longer emits -0.0 — the + 0.0 normalization "
        "in q_sample_weighted's oracle can be dropped"
    )
    fixed = con.execute(
        "SELECT round(CAST(-1e-308 AS DOUBLE), 9) + 0.0"
    ).fetchone()[0]
    assert _struct.pack("d", fixed) == _struct.pack("d", 0.0)


def test_date_functions_agree_on_proleptic_edges(spark):
    """r12 probe: YEAR/MONTH/DAYOFMONTH/DATE_TRUNC/DATE_DIFF agree
    across engines on the full proleptic-Gregorian range — including
    the 1582 calendar-transition window (both engines are proleptic;
    a future engine upgrade that reintroduces Julian handling, as
    Spark <3.0 had, breaks here first), century leap rules, and the
    year-1/9999 bounds. Agreement battery, not a contract: no graded
    fixture leaves 1992-2025, but the date keys shouldn't depend on
    that."""
    import datetime as _dt

    import duckdb as _duck

    from pyspark.sql import functions as F

    dates = [
        _dt.date(1, 1, 1), _dt.date(1582, 10, 4), _dt.date(1582, 10, 15),
        _dt.date(1600, 2, 29), _dt.date(1900, 3, 1), _dt.date(2000, 2, 29),
        _dt.date(2024, 2, 29), _dt.date(9999, 12, 31), _dt.date(1970, 1, 1),
        _dt.date(1969, 12, 31),
    ]
    df = spark.createDataFrame([(i, d) for i, d in enumerate(dates)], "i int, d date")
    got = {
        r.i: (r.y, r.m, r.dd, r.tr, r.dif)
        for r in df.select(
            "i",
            F.year("d").alias("y"),
            F.month("d").alias("m"),
            F.dayofmonth("d").alias("dd"),
            F.date_trunc("month", "d").cast("string").alias("tr"),
            F.datediff(F.lit(_dt.date(2002, 1, 1)), F.col("d")).alias("dif"),
        ).collect()
    }
    con = _duck.connect()
    for i, d in enumerate(dates):
        row = con.execute(
            "SELECT YEAR(?::DATE), MONTH(?::DATE), DAYOFMONTH(?::DATE), "
            "strftime(CAST(DATE_TRUNC('month', ?::DATE) AS TIMESTAMP), "
            "'%Y-%m-%d %H:%M:%S'), "
            "DATE_DIFF('day', ?::DATE, DATE '2002-01-01')",
            [d] * 5,
        ).fetchone()
        assert tuple(map(str, got[i])) == tuple(map(str, row)), (d, got[i], row)


def test_date_timestamp_rendering_agrees(spark):
    """r13 probe: unlike double->string (a full dialect, SCALE.md
    §18), DATE/TIMESTAMP->string AGREE across engines everywhere in
    the positive-year range — zero-padding to 4-digit years
    ('0099-12-31'), fractional-second trailing-zero trimming
    ('.120000' -> '.12', '.5' stays '.5'), whole seconds with no
    fraction, and both bounds (0001-01-01, 9999-12-31 23:59:59.999999)
    — so q_fn_map's 'day' entry (CAST(date AS STRING), a graded
    compared column) is safe on any representable fixture date, not
    just the 1900-9999 era block the fuzz axis rolls. The one
    divergence is BC years (Spark '-0001-01-01', DuckDB
    '0001-01-01 (BC)'), unreachable behind the declared event-time
    plausibility horizon; pinned as the discriminator."""
    import duckdb as _duck

    _pairs_date = ["0001-01-01", "0099-12-31", "0999-06-15", "1000-01-01",
                   "1582-10-04", "1582-10-15", "9999-12-31"]
    _pairs_ts = ["0001-01-01 00:00:00", "1969-12-31 23:59:59.5",
                 "2024-06-01 12:34:56.123456", "2024-06-01 12:34:56.120000",
                 "2024-06-01 12:34:56", "9999-12-31 23:59:59.999999",
                 "0099-01-01 01:02:03.000001"]
    con = _duck.connect()
    for d in _pairs_date:
        s = spark.sql(f"SELECT CAST(DATE'{d}' AS STRING)").collect()[0][0]
        k = con.execute(f"SELECT CAST(DATE '{d}' AS VARCHAR)").fetchone()[0]
        assert s == k == d, (d, s, k)
    for t in _pairs_ts:
        s = spark.sql(f"SELECT CAST(TIMESTAMP'{t}' AS STRING)").collect()[0][0]
        k = con.execute(f"SELECT CAST(TIMESTAMP '{t}' AS VARCHAR)").fetchone()[0]
        assert s == k, (t, s, k)
    # trailing-zero trimming is identical, not just compatible
    assert (
        spark.sql(
            "SELECT CAST(TIMESTAMP'2024-06-01 12:34:56.120000' AS STRING)"
        ).collect()[0][0]
        == "2024-06-01 12:34:56.12"
    )
    # the BC discriminator: if either spelling moves, re-probe the range
    assert (
        spark.sql("SELECT CAST(DATE'-0001-01-01' AS STRING)").collect()[0][0]
        == "-0001-01-01"
    )
    assert (
        con.execute("SELECT CAST(DATE '0001-01-01 (BC)' AS VARCHAR)").fetchone()[0]
        == "0001-01-01 (BC)"
    )


def test_json_number_token_rendering_divergence_is_contracted(spark):
    """r12 probe: the engines DISAGREE on re-rendering extracted JSON
    number tokens — a >int64 digit run comes back raw from Spark's
    get_json_object but as '1e23' from yyjson's json_extract_string,
    and 1e999 overflows to the quoted Jackson artifact '"Infinity"'
    on Spark vs bare 'Infinity' on DuckDB. The graded keys are immune
    BY CONSTRUCTION — q_fn_map unquotes the Jackson artifact and
    routes both spellings through DOUBLE_LITERAL_RE into the same
    double; q_try_cast's INT grammar rejects '1e23' where Spark's
    raw digits pass then overflow to NULL — NULL on both, by
    different gates. This pins the raw divergence (so an engine
    upgrade that changes rendering is noticed) and the convergence
    of the contracted routes."""
    import duckdb as _duck

    from pyspark.sql import functions as F

    from pipeline_airflow_docker_spark.plans.contracts import (
        DOUBLE_LITERAL_RE,
        INT_LITERAL_RE,
    )

    doc = '{"k": 100000000000000000000000}'
    s_raw = (
        spark.createDataFrame([(doc,)], "j string")
        .select(F.get_json_object("j", "$.k").alias("v"))
        .collect()[0]
        .v
    )
    d_raw = _duck.connect().execute(
        "SELECT json_extract_string(?::JSON, '$.k')", [doc]
    ).fetchone()[0]
    assert s_raw == "100000000000000000000000"
    assert d_raw == "1e23", (
        "yyjson no longer re-renders big ints — re-evaluate whether "
        "the DOUBLE-route convergence contract is still needed"
    )
    import re as _re

    # INT route: raw digits pass the grammar (then overflow to NULL
    # in the cast — pinned by the cast-grammar battery); '1e23' fails.
    assert _re.match(INT_LITERAL_RE, s_raw)
    assert not _re.match(INT_LITERAL_RE, d_raw)
    # DOUBLE route: both spellings pass and parse to the same double.
    assert _re.match(DOUBLE_LITERAL_RE, s_raw)
    assert _re.match(DOUBLE_LITERAL_RE, d_raw)
    assert float(s_raw) == float(d_raw) == 1e23
