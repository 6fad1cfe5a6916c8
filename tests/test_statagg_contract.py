"""The statistical-aggregate + window-edge cross-engine contract
(round 14).

The r14 probe ran the moment/distribution aggregates and window edge
cases through both engines:

AGREEMENTS (pinned — safe oracle surfaces):
1. stddev/variance DEFAULT to the SAMPLE estimator in BOTH engines;
   _pop/_samp variants agree; var_samp of one row is NULL, var_pop 0.
2. corr of a zero-variance column is NULL in both (not NaN).
3. bool_and/bool_or skip NULLs; SUM over no rows is NULL while COUNT
   is 0; FILTER (WHERE ..) clauses agree; min_by/max_by agree on
   unique extrema (ties are nondeterministic — don't grade ties).
4. Window edges: ntile front-loads the remainder identically;
   percent_rank (n-1 denominator) and cume_dist agree on ties;
   lag/lead defaults (NULL; explicit default) agree; Spark
   ``last(v, true)`` pairs with DuckDB ``last_value(v IGNORE
   NULLS)``; RANGE BETWEEN INTERVAL frames agree on timestamps.

DIALECTS (pinned with discriminators; census: no graded exposure):
5. skewness/kurtosis: DIFFERENT ESTIMATORS, not rounding — Spark
   computes population g1 / excess population g2; DuckDB computes
   the bias-corrected sample statistics (1.138 vs 1.697 on one
   5-row frame). Never put either in an oracle-compared column
   without computing the moments yourself.
6. corr(): 1-ulp NON-reproducibility (1.0 vs 0.999...98 on an exact
   linear relationship) — the built-in sums doubles in partition
   order. B37/q_corr_pearson compute Σx, Σy, Σxx, Σxy in exact
   DECIMAL for exactly this reason (relational.py:1691) — now
   measurement-backed, not just argued.
7. count(DISTINCT a, b): Spark follows SQL (a row with ANY null is
   excluded -> 2 on the probe frame); DuckDB's closest spelling
   ``count(DISTINCT (a, b))`` counts null-containing row-structs
   (-> 4). The faithful DuckDB pair needs an explicit
   ``FILTER (WHERE a IS NOT NULL AND b IS NOT NULL)``. No graded
   key counts distinct over multiple columns.

Probe provenance: /tmp/probe_stats.py run 2026-08-16.
"""

from __future__ import annotations

import duckdb

T = "(VALUES (1.0),(2.0),(3.0),(4.0),(10.0)) AS t(v)"


def _duck():
    con = duckdb.connect()
    con.execute("PRAGMA threads=4")
    return con


def test_stddev_variance_default_to_sample_in_both(spark):
    con = _duck()
    q = (f"SELECT stddev(v) AS s, variance(v) AS var, stddev_pop(v) AS sp,"
         f" stddev_samp(v) AS ss FROM {T}")
    s = spark.sql(q).collect()[0]
    d = con.execute(q).fetchone()
    assert (s.s, s.var, s.sp, s.ss) == d
    assert s.s == s.ss != s.sp                  # default == sample
    q1 = ("SELECT var_samp(v) AS a, var_pop(v) AS b FROM"
          " (VALUES (5.0)) AS t(v)")
    s1 = spark.sql(q1).collect()[0]
    d1 = con.execute(q1).fetchone()
    assert (s1.a, s1.b) == d1 == (None, 0.0)


def test_agg_edge_agreements(spark):
    con = _duck()
    q = ("SELECT corr(v, w) AS c FROM (VALUES (1.0, 2.0),(2.0, 2.0))"
         " AS t(v, w)")
    assert spark.sql(q).collect()[0].c is con.execute(q).fetchone()[0] is None
    q2 = ("SELECT bool_and(v) AS a, bool_or(v) AS o FROM"
          " (VALUES (true),(false),(NULL)) AS t(v)")
    s2, d2 = spark.sql(q2).collect()[0], con.execute(q2).fetchone()
    assert (s2.a, s2.o) == d2 == (False, True)
    q3 = ("SELECT sum(v) AS s, count(v) AS c FROM (VALUES (1)) AS t(v)"
          " WHERE v > 99")
    s3, d3 = spark.sql(q3).collect()[0], con.execute(q3).fetchone()
    assert (s3.s, s3.c) == d3 == (None, 0)
    q4 = ("SELECT min_by(k, v) AS a, max_by(k, v) AS b FROM"
          " (VALUES ('x', 1),('y', 3),('z', 2)) AS t(k, v)")
    s4, d4 = spark.sql(q4).collect()[0], con.execute(q4).fetchone()
    assert (s4.a, s4.b) == d4 == ("x", "y")


def test_window_edge_agreements(spark):
    con = _duck()
    q = ("SELECT v, ntile(3) OVER (ORDER BY v) AS n FROM"
         " (VALUES (1),(2),(3),(4),(5),(6),(7)) AS t(v) ORDER BY v")
    assert [tuple(r) for r in spark.sql(q).collect()] == \
        con.execute(q).fetchall() == [
            (1, 1), (2, 1), (3, 1), (4, 2), (5, 2), (6, 3), (7, 3)
        ]
    q2 = ("SELECT v, percent_rank() OVER (ORDER BY v) AS p,"
          " cume_dist() OVER (ORDER BY v) AS c FROM"
          " (VALUES (1),(2),(2),(3)) AS t(v) ORDER BY v, p")
    assert [tuple(r) for r in spark.sql(q2).collect()] == \
        con.execute(q2).fetchall()
    s3 = spark.sql(
        "SELECT last(v, true) OVER (ORDER BY k ROWS BETWEEN UNBOUNDED"
        " PRECEDING AND CURRENT ROW) AS l FROM (VALUES"
        " (1, CAST(10 AS INT)),(2, CAST(NULL AS INT)),(3, 30)) AS t(k, v)"
        " ORDER BY l NULLS FIRST"
    ).collect()
    d3 = con.execute(
        "SELECT last_value(v IGNORE NULLS) OVER (ORDER BY k ROWS BETWEEN"
        " UNBOUNDED PRECEDING AND CURRENT ROW) AS l FROM (VALUES"
        " (1, 10),(2, NULL),(3, 30)) AS t(k, v) ORDER BY l NULLS FIRST"
    ).fetchall()
    assert [r.l for r in s3] == [r[0] for r in d3] == [10, 10, 30]
    q4 = ("SELECT k, count(*) OVER (ORDER BY ts RANGE BETWEEN INTERVAL"
          " 1 HOUR PRECEDING AND CURRENT ROW) AS c FROM (VALUES"
          " (1, TIMESTAMP '2024-01-01 00:00:00'),"
          " (2, TIMESTAMP '2024-01-01 00:30:00'),"
          " (3, TIMESTAMP '2024-01-01 02:00:00')) AS t(k, ts) ORDER BY k")
    assert [tuple(r) for r in spark.sql(q4).collect()] == \
        con.execute(q4).fetchall() == [(1, 1), (2, 2), (3, 1)]


def test_skewness_kurtosis_are_different_estimators(spark):
    s = spark.sql(
        f"SELECT skewness(v) AS s, kurtosis(v) AS k FROM {T}"
    ).collect()[0]
    d = _duck().execute(
        f"SELECT skewness(v), kurtosis(v) FROM {T}"
    ).fetchone()
    assert abs(s.s - 1.1384199576606164) < 1e-12   # population g1
    assert abs(d[0] - 1.6970562748477143) < 1e-12  # sample G1
    assert abs(s.k - (-0.212)) < 1e-12             # excess population g2
    assert abs(d[1] - 3.152) < 1e-12               # sample-corrected
    assert abs(s.s - d[0]) > 0.5 and abs(s.k - d[1]) > 3, (
        "estimators converged — re-probe before grading either"
    )


def test_builtin_corr_is_not_bit_reproducible(spark):
    """corr of an EXACT linear relationship: Spark 1.0, DuckDB 1 ulp
    under — double accumulation order. The decimal-moment design in
    q_agg_moments / q_corr_pearson exists because of this."""
    import struct

    q = f"SELECT corr(v, v * 2) AS c FROM {T}"
    s = spark.sql(q).collect()[0].c
    d = _duck().execute(q).fetchone()[0]
    assert abs(s - d) < 1e-14
    assert struct.pack("<d", s) != struct.pack("<d", d), (
        "built-in corr is now bit-identical across engines on the "
        "probe frame — re-probe before relaxing the decimal-moment rule"
    )


def test_multicol_count_distinct_null_semantics_dialect(spark):
    """Spark count(DISTINCT a, b) excludes any-null tuples (SQL);
    DuckDB's row-struct spelling counts them. The faithful pair needs
    an explicit not-null FILTER."""
    s = spark.sql(
        "SELECT count(DISTINCT v, w) AS n FROM (VALUES (1,1),(1,NULL),"
        "(NULL,1),(1,1),(2,1)) AS t(v,w)"
    ).collect()[0].n
    assert s == 2
    con = _duck()
    naive = con.execute(
        "SELECT count(DISTINCT (v, w)) FROM (VALUES (1,1),(1,NULL),"
        "(NULL,1),(1,1),(2,1)) AS t(v,w)"
    ).fetchone()[0]
    assert naive == 4                           # NOT a pair
    faithful = con.execute(
        "SELECT count(DISTINCT (v, w)) FILTER (WHERE v IS NOT NULL AND"
        " w IS NOT NULL) FROM (VALUES (1,1),(1,NULL),(NULL,1),(1,1),"
        "(2,1)) AS t(v,w)"
    ).fetchone()[0]
    assert faithful == s == 2
