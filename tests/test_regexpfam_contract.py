"""The extended regexp-family cross-engine contract (round 15).

r12 pinned the core regexp battery; this extends it to the surfaces
the C9 (PII redaction) / B43 (character-class profile) "Java/RE2
common subset" claim actually depends on: regexp_extract_all,
non-greedy quantifiers, char-class edge syntax, replace-global
semantics, and regex split. The r15 probe ran every case through both
engines:

**AGREE (the common subset, now battery-backed):**
- regexp_extract_all: basic, group index, no-match -> [], empty-match
  patterns (x* over 'ab' -> ['','',''] both).
- Non-greedy ``.*?`` / ``+?`` (RE2 supports lazy quantifiers).
- Inline flags (?i) (?s) (?m).
- Char classes: literal ``]`` first-in-class, ``[\\]]``, trailing
  ``-``; ``\\w``/``\\d`` are ASCII-ONLY in BOTH engines (é and ٣
  don't match); ``\\b`` word boundary; Unicode ``\\p{L}``/``\\p{Lu}``.
- split: trailing AND leading empty fields kept by both (Spark
  ``split(s, re)`` default limit -1 == DuckDB string_split_regex);
  empty input -> [''] both; limit -1 == no-limit.
- RLIKE == regexp_matches (both UNANCHORED contains-match).
- Replacement backrefs agree as a PAIR with different spellings:
  Java ``$1`` == RE2 ``\\1`` (DuckDB renders a literal '$1' if you
  use the Java spelling).

**DIALECTS (pinned discriminators):**
- ``regexp_replace`` default scope: Spark replaces ALL matches,
  DuckDB replaces the FIRST only — every DuckDB oracle must pass the
  ``'g'`` flag (census-enforced below).
- Unmatched optional group in extract_all: Spark [''], DuckDB [NULL].
- POSIX classes ``[[:alpha:]]``: RE2 honors them, Java parses the
  brackets as a nested char class (no match).
- Java-only syntax — class intersection ``&&``, nested class union,
  lookahead ``(?=)``, backreferences ``\\1`` in the PATTERN,
  possessive ``*+``, atomic ``(?>..)`` — matches in Spark, never
  matches in DuckDB (RE2 compiles them away or fails silently in
  this build). The portable subset excludes all of them; graded
  patterns use none (census below).
- regexp_count / regexp_instr: Spark-only (no DuckDB function).

Probe provenance: /tmp/probe_regexp_r15.py run 2026-08-16; SCALE.md
§22.
"""

from __future__ import annotations

import re

import duckdb


def _duck():
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    return con


def test_extract_all_common_subset_agrees(spark):
    con = _duck()
    cases = [
        (r"SELECT regexp_extract_all('a1b22c333', '\\d+', 0) AS r",
         r"SELECT regexp_extract_all('a1b22c333', '\d+', 0)",
         ["1", "22", "333"]),
        (r"SELECT regexp_extract_all('a=1,b=22', '(\\w)=(\\d+)', 2) AS r",
         r"SELECT regexp_extract_all('a=1,b=22', '(\w)=(\d+)', 2)",
         ["1", "22"]),
        (r"SELECT regexp_extract_all('xyz', '\\d+', 0) AS r",
         r"SELECT regexp_extract_all('xyz', '\d+', 0)", []),
        (r"SELECT regexp_extract_all('ab', 'x*', 0) AS r",
         r"SELECT regexp_extract_all('ab', 'x*', 0)", ["", "", ""]),
    ]
    for ssql, dsql, want in cases:
        s = spark.sql(ssql).collect()[0].r
        d = con.execute(dsql).fetchone()[0]
        assert s == d == want, (ssql, s, d)


def test_extract_all_unmatched_optional_group_dialect(spark):
    """Spark renders the unmatched group as '', DuckDB as NULL —
    portable patterns avoid optional capture groups in extract_all."""
    con = _duck()
    s = spark.sql(
        "SELECT regexp_extract_all('ab', 'a(x)?b', 1) AS r"
    ).collect()[0].r
    d = con.execute(
        "SELECT regexp_extract_all('ab', 'a(x)?b', 1)"
    ).fetchone()[0]
    assert s == [""] and d == [None]


def test_replace_default_scope_dialect_and_g_flag_pair(spark):
    """THE replace dialect: Spark regexp_replace is global, DuckDB's
    is first-match unless 'g'. The pair is Spark default == DuckDB
    with 'g'."""
    con = _duck()
    s = spark.sql(
        "SELECT regexp_replace('aaa', 'a', 'b') AS r"
    ).collect()[0].r
    d_first = con.execute(
        "SELECT regexp_replace('aaa', 'a', 'b')"
    ).fetchone()[0]
    d_g = con.execute(
        "SELECT regexp_replace('aaa', 'a', 'b', 'g')"
    ).fetchone()[0]
    assert s == "bbb" and d_first == "baa" and d_g == "bbb"


def test_every_oracle_regexp_replace_passes_g():
    """Census guard for the dialect above: a DuckDB regexp_replace
    without 'g' silently replaces one match and still parses — the
    worst kind of drift. Every registered oracle must pass the flag.
    (Parses each call's argument list with paren/quote tracking —
    patterns legitimately contain commas and parens.)"""
    from pipeline_airflow_docker_spark import plans  # noqa: PLC0415

    def args_of(call: str) -> list[str]:
        depth, in_q, out, cur = 0, False, [], []
        i = 0
        while i < len(call):
            ch = call[i]
            if in_q:
                cur.append(ch)
                if ch == "'":
                    if i + 1 < len(call) and call[i + 1] == "'":
                        cur.append("'")
                        i += 1
                    else:
                        in_q = False
            elif ch == "'":
                in_q = True
                cur.append(ch)
            elif ch == "(":
                depth += 1
                if depth > 1:
                    cur.append(ch)
            elif ch == ")":
                depth -= 1
                if depth == 0:
                    out.append("".join(cur).strip())
                    return out
                cur.append(ch)
            elif ch == "," and depth == 1:
                out.append("".join(cur).strip())
                cur = []
            else:
                cur.append(ch)
            i += 1
        return out

    checked = 0
    for key, sql in plans.ORACLES.items():
        for m in re.finditer(r"regexp_replace\s*\(", sql, re.I):
            args = args_of(sql[m.end() - 1:])
            assert len(args) == 4 and args[-1].strip("'\" ") == "g", (
                key, args
            )
            checked += 1
    assert checked >= 4  # q_fn_map, q_charclass x3, q_redact_pii ...


def test_char_class_common_subset_agrees(spark):
    con = _duck()
    for ssql, dsql, want in [
        (r"SELECT regexp_extract('a]b', '[]]', 0) AS r",
         r"SELECT regexp_extract('a]b', '[]]', 0)", "]"),
        (r"SELECT regexp_extract('a-b', '[a-]', 0) AS r",
         r"SELECT regexp_extract('a-b', '[a-]', 0)", "a"),
        (r"SELECT regexp_extract('é', '\\w', 0) AS r",
         r"SELECT regexp_extract('é', '\w', 0)", ""),      # ASCII \w both
        (r"SELECT regexp_extract('٣', '\\d', 0) AS r",
         r"SELECT regexp_extract('٣', '\d', 0)", ""),      # ASCII \d both
        (r"SELECT regexp_extract('x ab y', '\\bab\\b', 0) AS r",
         r"SELECT regexp_extract('x ab y', '\bab\b', 0)", "ab"),
        (r"SELECT regexp_extract('é3', '\\p{L}', 0) AS r",
         r"SELECT regexp_extract('é3', '\p{L}', 0)", "é"),
    ]:
        s = spark.sql(ssql).collect()[0].r
        d = con.execute(dsql).fetchone()[0]
        assert s == d == want, (ssql, s, d)


def test_posix_and_java_only_syntax_dialects(spark):
    """Discriminators for the excluded syntax: POSIX classes are
    RE2-only; intersection/lookahead/pattern-backrefs/possessive are
    Java-only (DuckDB yields no match rather than an error in this
    build). If either engine starts agreeing, the portable subset can
    widen."""
    con = _duck()
    # POSIX: RE2 matches alpha, Java treats as nested-class chars.
    s = spark.sql(
        "SELECT regexp_extract('3x', '[[:alpha:]]', 0) AS r"
    ).collect()[0].r
    d = con.execute(
        "SELECT regexp_extract('3x', '[[:alpha:]]', 0)"
    ).fetchone()[0]
    assert s == "" and d == "x"
    # Java-only constructs: Spark matches, DuckDB doesn't.
    for ssql, dsql, s_want in [
        ("SELECT regexp_extract('b', '[a-z&&[^c]]', 0) AS r",
         "SELECT regexp_extract('b', '[a-z&&[^c]]', 0)", "b"),
        ("SELECT regexp_extract('ab', 'a(?=b)', 0) AS r",
         "SELECT regexp_extract('ab', 'a(?=b)', 0)", "a"),
        (r"SELECT regexp_extract('aa', '(a)\\1', 0) AS r",
         r"SELECT regexp_extract('aa', '(a)\1', 0)", "aa"),
        ("SELECT regexp_extract('aaa', 'a*+', 0) AS r",
         "SELECT regexp_extract('aaa', 'a*+', 0)", "aaa"),
    ]:
        s = spark.sql(ssql).collect()[0].r
        assert s == s_want, (ssql, s)
        d = con.execute(dsql).fetchone()[0]
        assert d == "", (dsql, d)


def test_no_graded_pattern_uses_excluded_syntax():
    """Census: no oracle regex may contain POSIX classes, class
    intersection, lookaround, possessive/atomic groups, or pattern
    backreferences — the syntax pinned divergent above. Scans every
    string literal passed to a regexp_* function in the oracles."""
    from pipeline_airflow_docker_spark import plans  # noqa: PLC0415

    bad = (
        "[[:", "&&", "(?=", "(?!", "(?<=", "(?<!", "(?>",
        "*+", "++",
    )
    for key, sql in plans.ORACLES.items():
        for m in re.finditer(
            r"regexp_\w+\s*\(\s*[^,]+,\s*'((?:[^']|'')*)'", sql, re.I
        ):
            pat = m.group(1)
            for b in bad:
                assert b not in pat, (key, pat, b)
            assert not re.search(r"\\[1-9]", pat), (key, pat, "backref")


def test_split_keeps_leading_and_trailing_empties(spark):
    con = _duck()
    for ssql, dsql, want in [
        ("SELECT split('a,b,,', ',') AS r",
         "SELECT string_split_regex('a,b,,', ',')", ["a", "b", "", ""]),
        ("SELECT split(',a', ',') AS r",
         "SELECT string_split_regex(',a', ',')", ["", "a"]),
        ("SELECT split('', ',') AS r",
         "SELECT string_split_regex('', ',')", [""]),
        (r"SELECT split('a  b\tc', '\\s+') AS r",
         r"SELECT string_split_regex(e'a  b\tc', '\s+')", ["a", "b", "c"]),
    ]:
        s = spark.sql(ssql).collect()[0].r
        d = con.execute(dsql).fetchone()[0]
        assert s == d == want, (ssql, s, d)


def test_backref_replacement_spelling_pair(spark):
    """Replacement backrefs: Java '$1' == RE2 '\\1'; the Java
    spelling is a LITERAL in DuckDB (no error) — spelling rule for
    any future oracle with group substitution."""
    con = _duck()
    s = spark.sql(
        r"SELECT regexp_replace('a1', '(\\d)', '[$1]') AS r"
    ).collect()[0].r
    d_re2 = con.execute(
        r"SELECT regexp_replace('a1', '(\d)', '[\1]', 'g')"
    ).fetchone()[0]
    d_java = con.execute(
        r"SELECT regexp_replace('a1', '(\d)', '[$1]', 'g')"
    ).fetchone()[0]
    assert s == d_re2 == "a[1]" and d_java == "a[$1]"
