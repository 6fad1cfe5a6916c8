"""The string-builder function cross-engine contract (round 14).

The r14 probe ran the concat/substring/pad/split family through both
engines. This surface underpins row_hash (concat_ws), the LSH band
keys and seeded_md5 (concat), and the tokenizers (split).

AGREEMENTS (pinned — the foundations):
1. ``concat_ws``: skips NULL args, keeps empty strings, all-NULL ->
   '' (not NULL), NULL *separator* -> NULL — identical in both
   engines. This is why row_hash can hash (key, NULL) distinctly
   from (key, ''): the explicit COALESCE sentinel does the work and
   concat_ws itself is portable.
2. ``split`` on a literal and on a regex: empty fields kept,
   trailing empty field kept, regex splits agree (Spark split ==
   DuckDB string_split / regexp_split_to_array).
3. substring with 1-based positive start (the SQL domain), negative
   start (suffix), overrun clamp; lpad/rpad with non-empty pad;
   repeat incl. 0/negative counts -> ''; instr (0 when absent,
   1 for empty needle); position of '' = 1; replace with empty
   pattern = no-op; translate with shorter to-set drops; reverse is
   code-point-safe (astral chars don't split).

DIALECTS (pinned with discriminators; census & rule):
4. ``concat`` with a NULL arg: Spark NULL-propagates (SQL
   semantics), DuckDB SKIPS the NULL like concat_ws. Rule: graded
   concat inputs must be non-null by construction (PK-derived
   strings, literals, hash outputs — the current census: recursive
   CTE paths, graph node ids, seeded_md5 over filtered shingles);
   nullable concatenation must go through concat_ws + explicit
   sentinel, the row_hash pattern.
5. substring start=0: Spark treats 0 as 1 ('abc'), DuckDB counts
   from 0 ('ab'). Stay 1-based.
6. left/right with NEGATIVE n: Spark -> '', DuckDB -> drop from the
   other end. Don't pass negatives.
7. lpad with an EMPTY pad string: Spark returns the (possibly
   truncated) input, DuckDB raises.
8. format_number has no DuckDB pair (thousand separators
   unsupported on floats there).

Probe provenance: /tmp/probe_strfn.py run 2026-08-16.
"""

from __future__ import annotations

import duckdb


def _duck():
    con = duckdb.connect()
    con.execute("PRAGMA threads=4")
    return con


def _agree(spark, con, ssql, dsql=None):
    s = [tuple(r) for r in spark.sql(ssql).collect()]
    d = con.execute(dsql or ssql).fetchall()
    assert s == d, (ssql, s, d)
    return s


def test_concat_ws_foundation_agrees(spark):
    con = _duck()
    rows = _agree(
        spark, con,
        "SELECT concat_ws('-', 'a', NULL, 'b') AS a,"
        " concat_ws('-', NULL, NULL) AS b,"
        " concat_ws('-', 'a', '', 'b') AS c,"
        " concat_ws(NULL, 'a', 'b') AS d",
    )
    assert rows == [("a-b", "", "a--b", None)]


def test_split_family_agrees(spark):
    con = _duck()
    s = spark.sql(
        "SELECT split('a,b,,c', ',') AS a, split('a,b,', ',') AS b,"
        " split('a1b22c', '[0-9]+') AS c"
    ).collect()[0]
    d = con.execute(
        "SELECT string_split('a,b,,c', ','), string_split('a,b,', ','),"
        " regexp_split_to_array('a1b22c', '[0-9]+')"
    ).fetchone()
    assert (list(s.a), list(s.b), list(s.c)) == tuple(d) == (
        ["a", "b", "", "c"], ["a", "b", ""], ["a", "b", "c"]
    )


def test_substring_pad_search_edges_agree(spark):
    con = _duck()
    rows = _agree(
        spark, con,
        "SELECT substring('abcdef', 1, 3) AS a, substring('abcdef', -2) AS b,"
        " substring('abc', 2, 100) AS c, substring('abc', 10, 2) AS d,"
        " lpad('ab', 5, 'xy') AS e, rpad('ab', 5, 'xy') AS f,"
        " lpad('abcdef', 3, 'x') AS g,"
        " repeat('ab', 0) AS h, repeat('ab', -1) AS i,"
        " instr('abcabc', 'bc') AS j, instr('abc', 'z') AS k,"
        " instr('abc', '') AS l, position('' IN 'abc') AS m,"
        " replace('abc', '', 'x') AS n, translate('abc', 'ab', 'x') AS o,"
        " reverse('ab🎉') AS p",
    )
    assert rows == [(
        "abc", "ef", "bc", "", "xyxab", "abxyx", "abc", "", "",
        2, 0, 1, 1, "abc", "xc", "🎉ba",
    )]


def test_concat_null_is_a_dialect(spark):
    """Spark NULL-propagates; DuckDB skips NULLs. Discriminator."""
    s = spark.sql("SELECT concat('a', NULL, 'b') AS c").collect()[0].c
    assert s is None
    d = _duck().execute("SELECT concat('a', NULL, 'b')").fetchone()[0]
    assert d == "ab"


def test_substring_zero_and_negative_leftright_are_dialects(spark):
    con = _duck()
    s = spark.sql(
        "SELECT substring('abcdef', 0, 3) AS a, left('abc', -1) AS b,"
        " right('abc', -1) AS c"
    ).collect()[0]
    assert (s.a, s.b, s.c) == ("abc", "", "")
    d = con.execute(
        "SELECT substring('abcdef', 0, 3), left('abc', -1), right('abc', -1)"
    ).fetchone()
    assert d == ("ab", "ab", "bc")


def test_lpad_empty_pad_is_an_engine_boundary(spark):
    assert spark.sql("SELECT lpad('ab', 5, '') AS a").collect()[0].a == "ab"
    try:
        _duck().execute("SELECT lpad('ab', 5, '')")
        raise AssertionError("DuckDB now accepts empty pad — re-probe")
    except duckdb.InvalidInputException:
        pass
