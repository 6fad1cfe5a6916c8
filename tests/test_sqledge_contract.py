"""The relational-closure edge contract: MAP semantics, grouping
bits, LIKE escapes, least/greatest, IN-with-NULL, set-op null
equality (round 15, session 2).

The last uncontracted corners of the relational surface the graded
keys stand on (q_fn_map's maps, q_grouping_sets' indicator bits,
q_filter_pred's LIKE, q_setops' null-equality semantics). The r15
probe:

**AGREE:**
- MAP: insertion-ordered map_keys, cardinality/size, duplicate
  build keys REFUSED by both (Spark DUPLICATED_MAP_KEY under its
  default EXCEPTION policy; DuckDB "keys must be unique"), NULL
  keys refused by both.
- GROUPING: grouping() per column AND grouping_id(a,b,c) agree
  bit-for-bit — FIRST listed column is the MOST significant bit in
  both engines (pinned on CUBE and on asymmetric GROUPING SETS).
  Probe-methodology footnote: DuckDB's list() aggregate does NOT
  preserve a subquery's ORDER BY — the r15 probe's first
  grouping_id reading was a false DIFF from exactly that; per-row
  comparison is the only trustworthy harness shape.
- LIKE: _/% wildcards, explicit ESCAPE clause, NULL pattern ->
  NULL, ILIKE (ASCII + simple unicode case folding).
- least/greatest SKIP NULLs (NULL only when all inputs NULL) —
  both.
- IN/NOT IN three-valued logic: 1 NOT IN (2, NULL) -> NULL (not
  TRUE!), 1 IN (1, NULL) -> TRUE — both.
- Set operations use NULL-safe grouping equality in both:
  NULL INTERSECT NULL -> 1 row, NULL EXCEPT NULL -> 0 rows,
  UNION dedups NULLs (matches the r12 q_setops contract).

**DIALECTS (pinned discriminators):**
- **LIKE treats backslash as an escape BY DEFAULT in Spark but NOT
  in DuckDB** ('50%' LIKE '50\\%' is TRUE vs FALSE; identical once
  ESCAPE '\\' is explicit). Census: no graded LIKE pattern may
  contain a backslash (the only graded pattern is 'F%').
- **DuckDB map extraction returns a LIST** (m['k'] -> [v], missing
  -> []) where Spark element_at returns the scalar / NULL — the
  oracle spelling needs [1]: map(...)['k'][1].
- map_concat is Spark-only (key collisions raise under the default
  policy — exercised only on disjoint maps in graded code).

Probe provenance: /tmp probes run 2026-08-16; SCALE.md §23.
"""

from __future__ import annotations

import duckdb
import pytest


def _duck():
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    return con


def test_map_access_shape_dialect_and_agreements(spark):
    con = _duck()
    s = spark.sql(
        "SELECT element_at(map('a',1,'b',2), 'b') AS hit,"
        " element_at(map('a',1), 'z') AS miss,"
        " map_keys(map('b',1,'a',2)) AS ks,"
        " size(map('a',1,'b',2)) AS n"
    ).collect()[0]
    d_hit, d_miss, d_ks, d_n = con.execute(
        "SELECT map(['a','b'],[1,2])['b'], map(['a'],[1])['z'],"
        " map_keys(map(['b','a'],[1,2])), cardinality(map(['a','b'],[1,2]))"
    ).fetchone()
    # dialect: DuckDB bracket yields a LIST; the pairing unwraps [1]
    assert s.hit == 2 and d_hit == [2]
    assert s.miss is None and d_miss == []
    assert con.execute(
        "SELECT map(['a','b'],[1,2])['b'][1]"
    ).fetchone()[0] == 2          # the oracle spelling
    # agreements: insertion order + cardinality
    assert s.ks == d_ks == ["b", "a"]
    assert s.n == d_n == 2


def test_map_duplicate_and_null_keys_refused_both(spark):
    con = _duck()
    from pyspark.errors import PySparkException  # noqa: PLC0415

    with pytest.raises(PySparkException):
        spark.sql("SELECT map('k',1,'k',2)").collect()
    with pytest.raises(PySparkException):
        spark.sql("SELECT map(CAST(NULL AS STRING), 1)").collect()
    with pytest.raises(duckdb.InvalidInputException):
        con.execute("SELECT map(['k','k'],[1,2])")
    with pytest.raises(duckdb.InvalidInputException):
        con.execute("SELECT map([NULL::VARCHAR],[1])")


def test_grouping_bits_agree_first_column_most_significant(spark):
    """Per-row comparison (list() in DuckDB ignores subquery ORDER BY
    — the false-DIFF trap): grouping()/grouping_id() bit-identical,
    first column = MSB, on CUBE and asymmetric GROUPING SETS."""
    con = _duck()
    s = spark.sql(
        "SELECT grouping(a) AS ga, grouping(b) AS gb,"
        " grouping_id(a,b) AS gid"
        " FROM VALUES (1,10) v(a,b) GROUP BY CUBE(a,b) ORDER BY gid"
    ).collect()
    d = con.execute(
        "SELECT grouping(a), grouping(b), grouping_id(a,b)"
        " FROM (VALUES (1,10)) v(a,b) GROUP BY CUBE(a,b) ORDER BY 3"
    ).fetchall()
    want = [(0, 0, 0), (0, 1, 1), (1, 0, 2), (1, 1, 3)]
    assert [(r.ga, r.gb, r.gid) for r in s] == want
    assert [tuple(r) for r in d] == want
    s3 = spark.sql(
        "SELECT grouping_id(a,b,c) AS g"
        " FROM VALUES (1,2,3) v(a,b,c)"
        " GROUP BY GROUPING SETS ((a,b,c),(a,b),(a),()) ORDER BY g"
    ).collect()
    d3 = con.execute(
        "SELECT grouping_id(a,b,c)"
        " FROM (VALUES (1,2,3)) v(a,b,c)"
        " GROUP BY GROUPING SETS ((a,b,c),(a,b),(a),()) ORDER BY 1"
    ).fetchall()
    assert [r.g for r in s3] == [r[0] for r in d3] == [0, 1, 3, 7]


def test_like_backslash_default_escape_dialect(spark):
    """Spark: backslash escapes by default; DuckDB: literal unless
    ESCAPE is explicit. Identical with the explicit clause."""
    con = _duck()
    s = spark.sql(
        "SELECT '50%' LIKE '50\\\\%' AS dflt,"
        " '50%' LIKE '50\\\\%' ESCAPE '\\\\' AS expl,"
        " 'abc' LIKE 'a_c' AS wild,"
        " 'ABC' ILIKE 'abc' AS il,"
        " ('a' LIKE CAST(NULL AS STRING)) IS NULL AS np"
    ).collect()[0]
    d = con.execute(
        r"SELECT '50%' LIKE '50\%',"
        r" '50%' LIKE '50\%' ESCAPE '\',"
        " 'abc' LIKE 'a_c', 'ABC' ILIKE 'abc',"
        " ('a' LIKE NULL::VARCHAR) IS NULL"
    ).fetchone()
    assert s.dflt is True and d[0] is False       # THE dialect
    assert s.expl is True and d[1] is True        # explicit ESCAPE pairs
    assert (s.wild, s.il, s.np) == (True, True, True)
    assert (d[2], d[3], d[4]) == (True, True, True)


def test_no_graded_like_pattern_contains_backslash():
    """Census for the dialect above."""
    import re  # noqa: PLC0415

    from pipeline_airflow_docker_spark import plans  # noqa: PLC0415

    for key, sql in plans.ORACLES.items():
        for m in re.finditer(r"(?:I?LIKE)\s+'([^']*)'", sql, re.I):
            assert "\\" not in m.group(1), (key, m.group(1))


def test_least_greatest_in_and_setop_null_semantics(spark):
    con = _duck()
    s = spark.sql(
        "SELECT least(3, NULL, 1) AS l,"
        " greatest(CAST(NULL AS INT), CAST(NULL AS INT)) AS g,"
        " (1 NOT IN (2, NULL)) IS NULL AS ni,"
        " 1 IN (1, NULL) AS yi,"
        " (SELECT count(*) FROM (SELECT NULL AS x INTERSECT"
        "  SELECT NULL)) AS i,"
        " (SELECT count(*) FROM (SELECT NULL AS x EXCEPT"
        "  SELECT NULL)) AS e,"
        " (SELECT count(*) FROM (SELECT NULL AS x UNION"
        "  SELECT NULL)) AS u"
    ).collect()[0]
    d = con.execute(
        "SELECT least(3, NULL, 1), greatest(NULL::INT, NULL::INT),"
        " (1 NOT IN (2, NULL)) IS NULL, 1 IN (1, NULL),"
        " (SELECT count(*) FROM (SELECT NULL AS x INTERSECT"
        "  SELECT NULL)),"
        " (SELECT count(*) FROM (SELECT NULL AS x EXCEPT"
        "  SELECT NULL)),"
        " (SELECT count(*) FROM (SELECT NULL AS x UNION SELECT NULL))"
    ).fetchone()
    assert (s.l, s.g, s.ni, s.yi, s.i, s.e, s.u) == (
        1, None, True, True, 1, 0, 1
    )
    assert tuple(d) == (1, None, True, True, 1, 0, 1)
