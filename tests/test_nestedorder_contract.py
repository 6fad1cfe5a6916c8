"""The array/struct/map ordering + equality cross-engine contract
(round 14).

The r14 probe compared nested-type comparison semantics across Spark
and DuckDB:

1. **Null-free nested ordering AGREES**: arrays compare element-wise
   lexicographically with prefix-first (``[1,2] < [1,2,3] < [2]``,
   ``[]`` first); structs compare field-wise in declaration order;
   NaN inside an array keeps the scalar total order (``[1.0] <
   [Inf] < [NaN]``) — all identical in both engines.
2. **Null PLACEMENT inside nested values is a DIALECT**: Spark
   sorts a NULL element/field BEFORE values (``[1,NULL] < [1,2]``;
   ``{x:NULL,..}`` first), DuckDB AFTER (``[1,2] < [1,NULL]``;
   ``{x:NULL,..}`` last), and a NULL array itself follows each
   engine's scalar default (first vs last). Graded plans must not
   ORDER BY a nested value that can contain NULLs (census: no
   graded key orders by any nested value at all — B24's
   sort_array is over non-null strings, covered by the r13
   string-order contract).
3. **Nested ``=`` with NULL members is a DIALECT**: Spark's array/
   struct equality is STRUCTURAL (``[1,NULL] = [1,NULL]`` -> TRUE,
   ``[1,NULL] = [1,2]`` -> FALSE); DuckDB propagates SQL NULL for
   both. An oracle-compared boolean computed by comparing nested
   values with nullable members would split engines.
4. **GROUP BY a nested value AGREES** (both engines group
   structurally — ``[1,NULL]`` forms one group of 2), so nested
   grouping keys are safe even with null members.
5. **Maps**: Spark REFUSES to ORDER BY a map (analysis error) while
   DuckDB sorts maps; Spark 4 *does* allow GROUP BY map and the
   group counts agree. Ordering by a map is therefore unwritable
   cross-engine; no graded key does.

Probe provenance: /tmp/probe_r14.py run 2026-08-16; SCALE.md §21.
"""

from __future__ import annotations

import duckdb
import pytest


def _duck():
    con = duckdb.connect()
    con.execute("PRAGMA threads=4")
    return con


def test_nullfree_array_and_struct_order_agree(spark):
    con = _duck()
    s = spark.sql(
        "SELECT a FROM (VALUES (ARRAY(1,2)), (ARRAY(1,2,3)), (ARRAY(1)),"
        " (ARRAY(2)), (ARRAY())) AS t(a) ORDER BY a"
    ).collect()
    d = con.execute(
        "SELECT a FROM (VALUES ([1,2]), ([1,2,3]), ([1]), ([2]), ([]))"
        " AS t(a) ORDER BY a"
    ).fetchall()
    assert [list(r.a) for r in s] == [list(r[0]) for r in d] == [
        [], [1], [1, 2], [1, 2, 3], [2]
    ]
    s2 = spark.sql(
        "SELECT s.x AS x, s.y AS y FROM (VALUES (named_struct('x',1,'y',2)),"
        " (named_struct('x',2,'y',0)), (named_struct('x',1,'y',1)))"
        " AS t(s) ORDER BY s"
    ).collect()
    d2 = con.execute(
        "SELECT s.x, s.y FROM (VALUES ({'x':1,'y':2}), ({'x':2,'y':0}),"
        " ({'x':1,'y':1})) AS t(s) ORDER BY s"
    ).fetchall()
    assert [(r.x, r.y) for r in s2] == list(d2) == [(1, 1), (1, 2), (2, 0)]


def test_array_of_double_keeps_scalar_total_order(spark):
    con = _duck()
    s = spark.sql(
        "SELECT a[0] AS v FROM (VALUES (ARRAY(CAST('NaN' AS DOUBLE))),"
        " (ARRAY(CAST('Infinity' AS DOUBLE))), (ARRAY(1.0))) AS t(a)"
        " ORDER BY a"
    ).collect()
    d = con.execute(
        "SELECT a[1] FROM (VALUES ([CAST('NaN' AS DOUBLE)]),"
        " ([CAST('Infinity' AS DOUBLE)]), ([1.0])) AS t(a) ORDER BY a"
    ).fetchall()
    import math

    canon = lambda v: "NaN" if math.isnan(v) else v  # noqa: E731
    assert [canon(r.v) for r in s] == [canon(r[0]) for r in d] == [
        1.0, float("inf"), "NaN"
    ]


def test_null_member_ordering_is_a_dialect(spark):
    """Discriminator: [1,NULL] sorts before [1,2] on Spark, after on
    DuckDB. Breaks loudly if either engine changes placement."""
    con = _duck()
    s = spark.sql(
        "SELECT a FROM (VALUES (ARRAY(1,CAST(NULL AS INT))),"
        " (ARRAY(1,2)), (ARRAY(1))) AS t(a) ORDER BY a"
    ).collect()
    assert [list(r.a) for r in s] == [[1], [1, None], [1, 2]]
    d = con.execute(
        "SELECT a FROM (VALUES ([1,NULL]), ([1,2]), ([1])) AS t(a)"
        " ORDER BY a"
    ).fetchall()
    assert [list(r[0]) for r in d] == [[1], [1, 2], [1, None]]


def test_nested_equality_with_null_member_is_a_dialect(spark):
    """Discriminator: Spark nested = is structural, DuckDB propagates
    NULL. No graded key compares nested values with nullable members
    into an oracle column."""
    s = spark.sql(
        "SELECT ARRAY(1,CAST(NULL AS INT)) = ARRAY(1,CAST(NULL AS INT)) AS e1,"
        " ARRAY(1,CAST(NULL AS INT)) = ARRAY(1,2) AS e2,"
        " named_struct('x',1,'y',CAST(NULL AS INT)) ="
        " named_struct('x',1,'y',CAST(NULL AS INT)) AS e3"
    ).collect()[0]
    assert (s.e1, s.e2, s.e3) == (True, False, True)
    d = _duck().execute(
        "SELECT [1,NULL] = [1,NULL], [1,NULL] = [1,2],"
        " {'x':1,'y':NULL} = {'x':1,'y':NULL}"
    ).fetchone()
    assert d == (None, None, None)


def test_group_by_array_with_null_element_agrees(spark):
    con = _duck()
    s = spark.sql(
        "SELECT a, count(*) AS n FROM (VALUES (ARRAY(1,CAST(NULL AS INT))),"
        " (ARRAY(1,CAST(NULL AS INT))), (ARRAY(1))) AS t(a)"
        " GROUP BY a ORDER BY n"
    ).collect()
    d = con.execute(
        "SELECT a, count(*) AS n FROM (VALUES ([1,NULL]), ([1,NULL]),"
        " ([1])) AS t(a) GROUP BY a ORDER BY n"
    ).fetchall()
    assert [(list(r.a), r.n) for r in s] == [(list(r[0]), r[1]) for r in d] \
        == [([1], 1), ([1, None], 2)]


def test_spark_refuses_order_by_map_but_groups_it(spark):
    from pyspark.sql.utils import AnalysisException

    with pytest.raises(AnalysisException, match="INVALID_ORDERING_TYPE"):
        spark.sql(
            "SELECT m FROM (VALUES (map(1,2)), (map(1,3))) AS t(m)"
            " ORDER BY m"
        ).collect()
    s = spark.sql(
        "SELECT count(*) AS n FROM (SELECT m FROM (VALUES (map(1,2)),"
        " (map(1,2))) AS t(m) GROUP BY m) g"
    ).collect()[0]
    d = _duck().execute(
        "SELECT count(*) FROM (SELECT m FROM (VALUES (MAP([1],[2])),"
        " (MAP([1],[2]))) AS t(m) GROUP BY m) g"
    ).fetchone()
    assert s.n == d[0] == 1
