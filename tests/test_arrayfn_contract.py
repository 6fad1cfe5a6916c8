"""The array-function cross-engine contract (round 14).

The r14 probe ran the array surface through both engines (Spark fn vs
its DuckDB list twin):

AGREEMENTS (pinned — pairs usable in oracles):
1. array_join == array_to_string: skips NULL elements; the
   null-replacement form pairs with list_transform+coalesce.
2. array_position == list_position (1-based, 0 when absent);
   slice(a, i, n) == a[i:i+n-1] incl. negative start; sequence ==
   range (desc and stepped — DuckDB range end is exclusive, Spark
   sequence inclusive: pair with the +step bound); flatten;
   collect_list == list() once order-normalized (sort after).

DIALECTS (pinned with discriminators):
3. array_contains(arr_with_null, missing): Spark three-valued NULL,
   DuckDB FALSE. (Hit agrees: TRUE both.)
4. array_distinct ORDER: Spark keeps first-seen order, DuckDB
   list_distinct returns an engine-internal order — only the
   cardinality and membership are portable. Census: every graded
   array_distinct feeds size(), explode() (set semantics), or
   min-hash — all order-independent (llm.py ttr; dedup.py shingle
   sets; decontam.py).
5. sort_array NULL placement: Spark nulls FIRST, DuckDB list_sort
   nulls LAST — the nested twin of the scalar default-ASC dialect
   (test_floatorder_contract.py). B24's sort_array is over non-null
   strings.

Probe provenance: /tmp/probe_math.py run 2026-08-16.
"""

from __future__ import annotations

import duckdb


def _duck():
    con = duckdb.connect()
    con.execute("PRAGMA threads=4")
    return con


def test_array_pairs_agree(spark):
    con = _duck()
    s = spark.sql(
        "SELECT array_join(ARRAY('a', NULL, 'b'), '-') AS a,"
        " array_join(ARRAY('a', NULL, 'b'), '-', 'N') AS b,"
        " array_position(ARRAY(10,20,30), 20) AS c,"
        " array_position(ARRAY(10,20), 99) AS d,"
        " slice(ARRAY(1,2,3,4), 2, 2) AS e,"
        " slice(ARRAY(1,2,3,4), -2, 2) AS f,"
        " sequence(5, 1) AS g, sequence(1, 10, 3) AS h,"
        " flatten(ARRAY(ARRAY(1,2), ARRAY(3))) AS i"
    ).collect()[0]
    d = con.execute(
        "SELECT array_to_string(['a', NULL, 'b'], '-'),"
        " list_aggregate(list_transform(['a', NULL, 'b'],"
        "   x -> coalesce(x, 'N')), 'string_agg', '-'),"
        " list_position([10,20,30], 20), list_position([10,20], 99),"
        " [1,2,3,4][2:3], [1,2,3,4][-2:],"
        " range(5, 0, -1), range(1, 11, 3), flatten([[1,2],[3]])"
    ).fetchone()
    assert (s.a, s.b, s.c, s.d) == tuple(d[:4]) == ("a-b", "a-N-b", 2, 0)
    assert [list(x) for x in (s.e, s.f, s.g, s.h, s.i)] == \
        [list(x) for x in d[4:]] == [
            [2, 3], [3, 4], [5, 4, 3, 2, 1], [1, 4, 7, 10], [1, 2, 3]
        ]


def test_collect_list_pairs_after_sort(spark):
    s = spark.sql(
        "SELECT array_sort(collect_list(v)) AS a FROM (VALUES (3),(1),(2))"
        " AS t(v)"
    ).collect()[0].a
    d = _duck().execute(
        "SELECT list_sort(list(v)) FROM (VALUES (3),(1),(2)) AS t(v)"
    ).fetchone()[0]
    assert list(s) == list(d) == [1, 2, 3]


def test_array_contains_missing_with_null_is_a_dialect(spark):
    s = spark.sql(
        "SELECT array_contains(ARRAY(1, NULL), 1) AS hit,"
        " array_contains(ARRAY(1, NULL), 2) AS miss"
    ).collect()[0]
    assert (s.hit, s.miss) == (True, None)      # three-valued
    d = _duck().execute(
        "SELECT list_contains([1, NULL], 1), list_contains([1, NULL], 2)"
    ).fetchone()
    assert d == (True, False)                   # two-valued


def test_array_distinct_order_is_engine_specific(spark):
    """Only cardinality/membership of array_distinct are portable."""
    s = spark.sql(
        "SELECT array_distinct(ARRAY(3,1,3,2,1)) AS a"
    ).collect()[0].a
    assert list(s) == [3, 1, 2]                 # first-seen order
    d = _duck().execute(
        "SELECT list_distinct([3,1,3,2,1])"
    ).fetchone()[0]
    assert sorted(d) == [1, 2, 3]
    assert list(d) != [3, 1, 2], (
        "DuckDB list_distinct now preserves first-seen order — "
        "re-probe before relying on it"
    )


def test_sort_array_null_placement_is_a_dialect(spark):
    s = spark.sql("SELECT sort_array(ARRAY(3,NULL,1)) AS a").collect()[0].a
    assert list(s) == [None, 1, 3]
    d = _duck().execute("SELECT list_sort([3,NULL,1])").fetchone()[0]
    assert list(d) == [1, 3, None]
