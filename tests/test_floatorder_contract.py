"""The NaN / -0.0 / NULL ordering cross-engine contract (round 14).

The r14 probe ran a float battery (NaN, +/-Inf, -0.0, 0.0, NULL,
finites) through ORDER BY, rank/RANGE windows, min/max, greatest/
least, GROUP BY, DISTINCT, and equi-joins in BOTH engines:

1. **NaN total order AGREES everywhere**: both engines place
   ``-Inf < finite < +Inf < NaN`` — in sorts, in rank() and RANGE
   frames, in min/max (``max`` returns NaN when present; ``min``
   never does), in greatest/least (NaN is the greatest), in
   comparisons (``NaN = NaN`` is TRUE, ``NaN > Inf`` is TRUE — both
   engines use total order for equality/comparison on doubles, not
   IEEE), in GROUP BY (one NaN group), and as a join key (NaN
   matches NaN).
2. **-0.0 AGREES everywhere**: ``-0.0 = 0.0`` is TRUE; grouping,
   DISTINCT, min/max, and join keys merge the two zeros and BOTH
   engines surface the representative as +0.0 regardless of input
   order (Spark normalizes -0.0 in grouping keys per SPARK-26021;
   DuckDB observably does the same), so a grouped-by double can
   never leak an engine-dependent zero sign into %a rendering.
3. **Explicit NULLS FIRST/LAST AGREES** in all four ASC/DESC
   combinations, and the DESC *default* agrees too (both engines
   put NULLs last on DESC).
4. **THE ONE DIALECT: default NULL placement on ASC.** Spark sorts
   ``ORDER BY v`` (no NULLS spec) NULLS FIRST; DuckDB sorts it
   NULLS LAST. Any graded ORDER BY over a nullable sort key must
   carry an explicit NULLS FIRST/LAST (or sort only non-null
   columns); B35 (q_win_null_order) is the graded key that pins the
   explicit-spec behavior end-to-end.

Probe provenance: /tmp/probe_r14{,a}.py run 2026-08-16; facts
summarized in SCALE.md §21.
"""

from __future__ import annotations

import duckdb

FLOATS = (
    "(VALUES (CAST('NaN' AS DOUBLE)), (CAST('Infinity' AS DOUBLE)),"
    " (CAST('-Infinity' AS DOUBLE)), (CAST(-0.0 AS DOUBLE)),"
    " (CAST(0.0 AS DOUBLE)), (CAST(NULL AS DOUBLE)), (1.0), (-1.0))"
    " AS t(v)"
)


def _duck():
    con = duckdb.connect()
    con.execute("PRAGMA threads=4")
    return con


def _pair(spark, con, ssql, dsql=None):
    s = [tuple(r) for r in spark.sql(ssql).collect()]
    d = con.execute(dsql or ssql).fetchall()
    return s, d


def _bits(rows):
    """Rows -> sign-and-payload-faithful reprs (repr distinguishes
    nothing about -0.0; struct.pack does)."""
    import math
    import struct

    def c(v):
        if isinstance(v, float):
            if math.isnan(v):
                return "NaN"
            return struct.pack("<d", v).hex()
        return v

    return [tuple(c(v) for v in r) for r in rows]


def test_nan_total_order_agrees_in_sorts_windows_aggregates(spark):
    con = _duck()
    for ssql in (
        f"SELECT v FROM {FLOATS} ORDER BY v ASC NULLS LAST",
        f"SELECT v FROM {FLOATS} ORDER BY v DESC NULLS LAST",
        f"SELECT v, rank() OVER (ORDER BY v NULLS FIRST) AS r "
        f"FROM {FLOATS} ORDER BY r, v",
        f"SELECT v, count(*) OVER (ORDER BY v RANGE BETWEEN 1.0 "
        f"PRECEDING AND CURRENT ROW) AS c FROM {FLOATS} "
        f"WHERE v IS NOT NULL ORDER BY v, c",
        f"SELECT min(v) AS mn, max(v) AS mx FROM {FLOATS}",
        "SELECT greatest(CAST('NaN' AS DOUBLE), CAST('Infinity' AS DOUBLE)) AS g,"
        " least(CAST('NaN' AS DOUBLE), -1.0) AS l",
    ):
        s, d = _pair(spark, con, ssql)
        assert _bits(s) == _bits(d), (ssql, s, d)


def test_nan_comparison_grouping_join_agree(spark):
    con = _duck()
    for ssql in (
        "SELECT CAST('NaN' AS DOUBLE) = CAST('NaN' AS DOUBLE) AS eq,"
        " CAST('NaN' AS DOUBLE) > CAST('Infinity' AS DOUBLE) AS gt",
        "SELECT count(*) AS n FROM (SELECT v FROM (VALUES"
        " (CAST('NaN' AS DOUBLE)), (CAST('NaN' AS DOUBLE))) AS t(v)"
        " GROUP BY v) s",
        "SELECT count(*) AS n FROM (VALUES (CAST('NaN' AS DOUBLE))) AS a(v)"
        " JOIN (VALUES (CAST('NaN' AS DOUBLE))) AS b(v) ON a.v = b.v",
    ):
        s, d = _pair(spark, con, ssql)
        assert _bits(s) == _bits(d), (ssql, s, d)
    # the shared semantic, stated: total-order equality, NaN topmost
    row = spark.sql(
        "SELECT CAST('NaN' AS DOUBLE) = CAST('NaN' AS DOUBLE) AS eq"
    ).collect()[0]
    assert row.eq is True


def test_negzero_normalizes_to_positive_zero_in_both_engines(spark):
    import math

    con = _duck()
    zeros = ("(VALUES (CAST(-0.0 AS DOUBLE)), (CAST(0.0 AS DOUBLE)),"
             " (CAST(-0.0 AS DOUBLE))) AS t(v)")
    for ssql in (
        f"SELECT v, count(*) AS n FROM {zeros} GROUP BY v",
        f"SELECT DISTINCT v FROM {zeros}",
        f"SELECT min(v) AS mn, max(v) AS mx FROM {zeros}",
    ):
        s, d = _pair(spark, con, ssql)
        assert _bits(s) == _bits(d), (ssql, s, d)
        for row in s:
            for v in row:
                if isinstance(v, float):
                    # representative is +0.0, bit-exactly, both engines
                    assert math.copysign(1.0, v) == 1.0, (ssql, s)


def test_default_asc_null_placement_is_a_dialect(spark):
    """The discriminator: ORDER BY v (no NULLS spec) on a nullable
    key puts NULLs FIRST on Spark and LAST on DuckDB. If either
    engine changes its default, this pin breaks loudly and the
    explicit-NULLS rule for graded plans can be re-evaluated."""
    con = _duck()
    q = "SELECT v FROM (VALUES (1), (NULL), (2)) AS t(v) ORDER BY v"
    s = [r.v for r in spark.sql(q).collect()]
    d = [r[0] for r in con.execute(q).fetchall()]
    assert s == [None, 1, 2], s
    assert d == [1, 2, None], d
    # ...and DESC defaults AGREE (both NULLS LAST):
    qd = q + " DESC"
    s2 = [r.v for r in spark.sql(qd).collect()]
    d2 = [r[0] for r in con.execute(qd).fetchall()]
    assert s2 == d2 == [2, 1, None]
