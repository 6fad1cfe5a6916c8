"""The implicit-type-coercion cross-engine contract (round 15,
session 2).

q_union_ragged unions heterogeneous fragments and every graded
filter compares across types somewhere — this pins the coercion
lattice both engines apply. The r15 probe:

**AGREE (modulo type-NAME casing, spark 'string' == duck
'VARCHAR'):**
- UNION column coercion: int U string -> string; int U 1.5-literal
  -> DECIMAL(11,1) in BOTH (the literal is decimal-typed in both
  engines, and both pick the same merged precision); int U bigint
  -> bigint; date U timestamp -> timestamp; decimal U double ->
  double.
- Comparison coercion is NUMERIC, not lexicographic, in both:
  1 = '1' TRUE, 1 = '1.0' TRUE, '2' > 10 FALSE; DATE/TIMESTAMP =
  string parse-compare TRUE; bool = int TRUE; IN-list coercion
  matches (1 IN ('1'), '1' IN (1) both TRUE).
- String || int concatenates in both ('x1').

**DIALECTS (pinned discriminators):**
- ARITHMETIC on strings: Spark coerces '1' + 1 -> 2.0 (string ->
  double, permissive); DuckDB REFUSES to bind + on VARCHAR.
- Unparseable string vs number comparison: Spark (ansi off) ->
  NULL ('a' = 1); DuckDB raises ConversionException — the
  permissive-NULL-vs-raise family (r14 DECIMAL boundary, r15
  unhex).
- CASE branch typing with int/string arms: Spark widens to STRING;
  DuckDB binds INTEGER (and would raise at runtime on a
  non-numeric arm) — mixed-type CASE arms are not portable; graded
  plans type their branches explicitly.

Probe provenance: /tmp probe run 2026-08-16; SCALE.md §23.
"""

from __future__ import annotations

import duckdb
import pytest

# spark typeof -> duckdb typeof equivalences
NAME_PAIRS = {
    "string": "VARCHAR",
    "bigint": "BIGINT",
    "timestamp": "TIMESTAMP",
    "double": "DOUBLE",
    "decimal(11,1)": "DECIMAL(11,1)",
}


def _duck():
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    return con


def test_union_coercion_lattice_agrees(spark):
    con = _duck()
    cases = [
        ("SELECT 1 AS x UNION ALL SELECT 'a'", "string"),
        ("SELECT 1 AS x UNION ALL SELECT 1.5", "decimal(11,1)"),
        ("SELECT CAST(1 AS INT) AS x UNION ALL SELECT CAST(1 AS BIGINT)",
         "bigint"),
        ("SELECT DATE '2024-01-01' AS x UNION ALL"
         " SELECT TIMESTAMP '2024-01-01 01:00:00'", "timestamp"),
        ("SELECT CAST(1.5 AS DECIMAL(5,2)) AS x UNION ALL"
         " SELECT CAST(1 AS DOUBLE)", "double"),
    ]
    for body, s_want in cases:
        s = spark.sql(
            f"SELECT typeof(x) AS t FROM ({body}) LIMIT 1"
        ).collect()[0].t
        d = con.execute(
            f"SELECT typeof(x) FROM ({body}) LIMIT 1"
        ).fetchone()[0]
        assert s == s_want and d == NAME_PAIRS[s_want], (body, s, d)


def test_comparison_coercion_is_numeric_both(spark):
    con = _duck()
    exprs = [
        ("1 = '1'", True),
        ("1 = '1.0'", True),
        ("'2' > 10", False),
        ("DATE '2024-01-01' = '2024-01-01'", True),
        ("TIMESTAMP '2024-01-01 00:00:00' = '2024-01-01 00:00:00'", True),
        ("true = 1", True),
        ("1 IN ('1')", True),
        ("'1' IN (1)", True),
    ]
    sel = ", ".join(f"({e}) AS c{i}" for i, (e, _) in enumerate(exprs))
    srow = spark.sql(f"SELECT {sel}").collect()[0]
    drow = con.execute(
        "SELECT " + ", ".join(e for e, _ in exprs)
    ).fetchone()
    for i, (e, want) in enumerate(exprs):
        assert srow[i] is want, (e, srow[i])
        assert drow[i] is want, (e, drow[i])


def test_string_arithmetic_dialect(spark):
    """Spark coerces strings into arithmetic; DuckDB refuses to bind."""
    con = _duck()
    s = spark.sql("SELECT '1' + 1 AS a, '1.5' + 1 AS b").collect()[0]
    assert s.a == 2.0 and s.b == 2.5
    with pytest.raises(duckdb.BinderException):
        con.execute("SELECT '1' + 1")
    # unparseable comparison: permissive NULL vs raise
    assert spark.sql("SELECT ('a' = 1) IS NULL AS n").collect()[0].n
    with pytest.raises(duckdb.ConversionException):
        con.execute("SELECT 'a' = 1")
    # concatenation agrees
    s2 = spark.sql("SELECT 'x' || 1 AS c").collect()[0].c
    d2 = con.execute("SELECT 'x' || 1").fetchone()[0]
    assert s2 == d2 == "x1"


def test_case_branch_typing_dialect(spark):
    """int/string CASE arms: Spark widens to string; DuckDB binds
    INTEGER. Mixed-type arms are not portable."""
    con = _duck()
    s = spark.sql(
        "SELECT typeof(CASE WHEN true THEN 1 ELSE 'a' END) AS t"
    ).collect()[0].t
    assert s == "string"
    d = con.execute(
        "SELECT typeof(CASE WHEN true THEN 1 ELSE 'a' END)"
    ).fetchone()[0]
    assert d == "INTEGER"
    # ...and the numeric pair agrees (decimal merge, same precision):
    s2 = spark.sql(
        "SELECT typeof(CASE WHEN true THEN 1 ELSE 1.5 END) AS t"
    ).collect()[0].t
    d2 = con.execute(
        "SELECT typeof(CASE WHEN true THEN 1 ELSE 1.5 END)"
    ).fetchone()[0]
    assert s2 == "decimal(11,1)" and d2 == "DECIMAL(11,1)"
