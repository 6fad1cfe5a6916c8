"""Malformed-HTML scrape contract (round 12 — the last parser boundary
after CSV/JSON/cast, probed FIRST per the r11 method).

The probe corpus below ran through sources/scrape.py BEFORE the
contract was written; three silent-loss classes it found (an <h1> left
open at EOF dropped its title, nested <h1> lost the outer prefix and
an entire title slot, duplicate href attributes kept the LAST value
where HTML5/bs4 keep the first) plus one presence contract (the
reference's ``find_all('a', href=True)`` keeps valueless/empty hrefs;
``if href:`` dropped them) are now part of the module docstring
contract and red-fenced here. The reference's BeautifulSoup ingest
[ref dags/scrap_to_kafka_to_mongo_pipeline.py:57-68] is the model for
every decision.

Also pinned: the STRIP_WS charset (titles strip PYTHON whitespace —
SQL trim is space-only; DuckDB's default trim even disagrees with
Spark's about NBSP, found by fuzz axis 7 seed 13) and the DuckDB
side-by-side showing trim(x, STRIP_WS) == str.strip() on a hostile
corpus, which is what lets q_scrape's and q_project_upper's oracles
mirror the engine exactly.
"""

from __future__ import annotations

import duckdb
import pytest

from pipeline_airflow_docker_spark.sources.scrape import (
    STRIP_WS,
    parse_page,
)


def titles(html: str) -> list[str]:
    return [r["content"] for r in parse_page(html) if r["type"] == "title"]


def links(html: str) -> list[str]:
    return [r["content"] for r in parse_page(html) if r["type"] == "link"]


# ------------------------------------------------------ silent-loss pins
def test_unclosed_h1_at_eof_still_titles():
    """Probe finding #1: the title must flush at EOF (bs4 recovers;
    pre-r12 the buffered text was silently dropped)."""
    assert titles("<html><h1>Lost Title") == ["Lost Title"]
    # ...including when other elements follow inside the open h1
    assert titles('<h1>T<a href="x">l</a>') == ["Tl"]
    assert links('<h1>T<a href="x">l</a>') == ["x"]


def test_nested_h1_one_title_per_start_tag_document_order():
    """Probe finding #2: one title per h1 START, in start-tag order,
    nested text accruing to every open capture — the element-tree
    shape bs4's find_all('h1') + .text yields. Pre-r12 the outer
    prefix was silently lost and only ONE title emitted."""
    assert titles("<h1>outer <h1>inner</h1> tail</h1>") == [
        "outer inner tail",
        "inner",
    ]
    out = parse_page("<h1>a<h1>b</h1></h1>")
    assert [(r["index"], r["content"]) for r in out] == [(1, "ab"), (2, "b")]


def test_duplicate_href_first_wins():
    """Probe finding #3: HTML5 duplicate-attribute rule — the first
    href wins (dict(attrs) silently kept the last)."""
    assert links('<a href="first" href="second">l</a>') == ["first"]


def test_href_presence_not_truthiness():
    """The reference's find_all('a', href=True) is PRESENCE-based:
    valueless and empty hrefs are links with content ''; an <a>
    without href is not a link."""
    assert links("<a href>l</a>") == [""]
    assert links('<a href="">l</a>') == [""]
    assert links('<a name="x">l</a>') == []


# --------------------------------------------------- neutral-class pins
def test_markup_case_quoting_whitespace_neutral():
    assert links('<A HREF="x">l</A>') == ["x"]
    assert links("<a href=x>l</a>") == ["x"]
    assert links("<a href='x'>l</a>") == ["x"]
    assert links('<a   href = "x"  >l</a>') == ["x"]
    assert titles("<H1>T</H1>") == ["T"]
    assert titles("<h1 class='x' id=y>T</h1 junk>") == ["T"]


def test_lt_nonletter_is_text_not_tag():
    """HTML5 tokenizer rule (same as bs4): '<' before a non-letter is
    character data."""
    assert links('< a href="x">l</a>') == []
    assert titles("<h1>1 < 2 and 3 > 2</h1>") == ["1 < 2 and 3 > 2"]


def test_empty_and_self_closing():
    assert titles("<h1></h1><h1>real</h1>") == ["", "real"]
    assert titles("<h1/>after<h1>real</h1>") == ["", "real"]
    assert links('<a href="x"/>') == ["x"]


def test_link_cap_first_ten():
    html = "".join(f'<a href="u{i}">l</a>' for i in range(12))
    assert links(html) == [f"u{i}" for i in range(10)]


def test_charrefs_decode_per_html5():
    assert titles("<h1>A &amp; B &lt;tag&gt;</h1>") == ["A & B <tag>"]
    assert titles("<h1>&#65;&#x42;</h1>") == ["AB"]
    # legacy no-semicolon form decodes; unknown entity stays literal;
    # NUL / out-of-range code points become U+FFFD
    assert titles("<h1>&copy x</h1>") == ["\xa9 x"]
    assert titles("<h1>&notanentity;</h1>") == ["\xacanentity;"]
    assert titles("<h1>&#0;&#1114112;</h1>") == ["��"]
    # the double-escape round trip q_scrape relies on: escaped text
    # decodes back to the raw text, never twice
    assert titles("<h1>&amp;amp; &amp;#65;</h1>") == ["&amp; &#65;"]


def test_script_style_cdata_comment_opacity():
    """Markup inside script/style/CDATA/comments never parses as tags;
    script text inside an h1 accrues verbatim (bs4 .text parity)."""
    assert links("<script>var a = '<a href=\"no\">';</script><a href='yes'>l</a>") == ["yes"]
    assert links("<style>h1:after{content:'<a href=\"no\">'}</style>") == []
    assert links('<![CDATA[<a href="no">]]><a href="yes">l</a>') == ["yes"]
    assert titles("<h1>a<!-- <a href='no'> -->b</h1>") == ["ab"]
    assert titles('<h1>a<script><a href="no">x</a></script>b</h1>') == [
        'a<a href="no">x</a>b'
    ]


def test_inline_tags_and_stray_ends():
    assert titles("<h1>a <b>bold</b> c</h1>") == ["a bold c"]
    assert titles("</h1></a><h1>T</h1>") == ["T"]


def test_null_and_empty_page():
    assert parse_page(None) == []
    assert parse_page("") == []


# ------------------------------------------------------ strip contract
def test_strip_ws_is_exactly_python_isspace():
    """STRIP_WS is hardcoded (a unicodedata bump must not silently
    re-contract the graded surface); this recomputes the truth."""
    expect = {chr(c) for c in range(0x110000) if chr(c).isspace()}
    assert set(STRIP_WS) == expect
    assert len(STRIP_WS) == len(set(STRIP_WS))


def test_title_strip_is_python_strip():
    for pad in ["\t", "\n", "\r\n", "\xa0", "　", "  ", "\x1c"]:
        assert titles(f"<h1>{pad}x{pad}</h1>") == ["x"]


HOSTILE_EDGES = [
    "x", " x ", "\tx\t", "\xa0x\xa0", "　x　", "\nx\r\n",
    "\x1c\x1d\x1e\x1fx\x85", "", " ", "\xa0", "a b", " inner kept\t",
    "  x  ", "mixed \xa0\t\n tail　",
]


def test_duckdb_trim_charset_matches_python_strip():
    """The oracle side of the contract: trim(x, STRIP_WS-as-chr()) in
    DuckDB == str.strip() in Python on every hostile edge — this
    equivalence is what q_scrape's / q_project_upper's oracles stand
    on. Also pins WHY the charset is mandatory: DuckDB's default
    trim() eats NBSP where Spark's does not (seed-13 fuzz finding), so
    a bare trim() oracle is wrong by construction."""
    charset_sql = "(" + " || ".join(f"chr({ord(c)})" for c in STRIP_WS) + ")"
    con = duckdb.connect()
    for s in HOSTILE_EDGES:
        got = con.execute(
            f"SELECT trim(?, {charset_sql})", [s]
        ).fetchone()[0]
        assert got == s.strip(), repr(s)
    # the non-vacuity pin: default trims disagree about NBSP
    assert con.execute("SELECT trim('x' || chr(160))").fetchone()[0] == "x"
    con.close()


def test_spark_trim_charset_matches_python_strip(spark):
    """Engine side: TRIM(BOTH <STRIP_WS as \\uXXXX literal> FROM col)
    == str.strip() on the same corpus, and Spark's DEFAULT trim keeps
    NBSP (the divergence that makes the explicit charset load-bearing).
    The TRIM(BOTH..FROM..) SQL form, not two-param F.trim (deprecated
    in Spark 4.1); \\uXXXX escapes, not char() (Spark's char is
    mod-256 and cannot spell code points past U+00FF)."""
    from pyspark.sql import functions as F

    lit = "'" + "".join(f"\\u{ord(c):04x}" for c in STRIP_WS) + "'"
    df = spark.createDataFrame([(i, s) for i, s in enumerate(HOSTILE_EDGES)], "i INT, s STRING")
    rows = df.select(
        "i",
        F.expr(f"trim(BOTH {lit} FROM s)").alias("t"),
        F.trim(F.col("s")).alias("t_default"),
    ).collect()
    for r in rows:
        assert r.t == HOSTILE_EDGES[r.i].strip(), repr(HOSTILE_EDGES[r.i])
    nbsp = spark.createDataFrame([("x\xa0",)], "s STRING").select(
        F.trim("s").alias("t")
    ).first()
    assert nbsp.t == "x\xa0"  # Spark default trim: ASCII space only
