"""The array higher-order-function + unicode-normalization contract
(round 15).

The ANN/embedding family (operators/similarity.py, plans/llm.py)
computes dot products and norms with F.aggregate/F.zip_with, and its
oracles replay them with DuckDB list_* functions — this battery pins
that substrate edge by edge. The normalization half pins the fact
every dedup operator implicitly relies on: both engines compare
strings by CODEPOINTS, so NFC/NFD variants of the same visible text
are DISTINCT everywhere.

**AGREE (the graded substrate):**
- transform/list_transform (incl. NULL elements propagating through
  the lambda, empty arrays, NULL arrays), filter/list_filter (a NULL
  predicate result drops the element in BOTH), exists/forall pairs
  (via list_bool_or/and over list_transform).
- aggregate(arr, 0, +) == list_reduce(list_prepend(0, arr), +),
  including the NULL-element -> NULL-total propagation; the finish
  lambda composes the same.
- THE DOT PRODUCT: aggregate(zip_with(a, b, *), 0.0, +) ==
  list_reduce(list_prepend(0.0, list_transform(list_zip(a, b),
  t -> t[1]*t[2])), +) — exact on doubles.
- Element access: Spark element_at(a, n) == DuckDB a[n] for
  positive, NEGATIVE (-1 = last), and out-of-range (NULL) indices;
  array_position/list_position (both 1-based, 0 when absent);
  slice(a, start, len) == a[start:start+len-1]; flatten;
  sequence(1,5) == range(1,6); array_max skips NULLs like list_max.

**DIALECTS (pinned discriminators):**
- **Lambda INDEX base: Spark (x, i) -> i is 0-BASED, DuckDB's is
  1-BASED** — transform-with-index is not portable without an
  explicit +1/-1; no graded plan uses the index form (census).
- Spark's SQL bracket a[0] is 0-based (element_at and DuckDB
  brackets are 1-based) — the spelling rule: oracles pair
  element_at(a, n) with a[n], never Spark's bracket.
- zip_with is Spark-only; the DuckDB spelling is
  list_transform(list_zip(...), t -> ...) (pinned equal above).
- DuckDB's list_aggregate(arr, 'sum') SKIPS nulls (4 over
  [1,NULL,3]) while both engines' lambda-reduce propagates NULL —
  an IN-ENGINE divergence: oracles must use list_reduce, not
  list_aggregate, when mirroring F.aggregate.

**Unicode normalization (both engines agree, the fact is the
contract):** NFC 'café' (4 cp) != NFD 'café' (5 cp) under =, GROUP
BY, length, upper, and md5 in BOTH engines — content-addressed dedup
treats them as different documents. Spark has NO normalize()
function (DuckDB has nfc_normalize), so normalization-aware dedup
would be a Pandas-UDF preprocessing step, not a SQL expression.

Probe provenance: /tmp/probe_hof_r15.py run 2026-08-16; SCALE.md
§23.
"""

from __future__ import annotations

import unicodedata

import duckdb

NFC = unicodedata.normalize("NFC", "café")
NFD = unicodedata.normalize("NFD", "café")


def _duck():
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    return con


def test_transform_filter_reduce_common_subset(spark):
    con = _duck()
    cases = [
        ("SELECT transform(array(1,2,3), x -> x + 1) AS r",
         "SELECT list_transform([1,2,3], x -> x + 1)", [2, 3, 4]),
        ("SELECT transform(array(1, NULL, 3), x -> x + 1) AS r",
         "SELECT list_transform([1, NULL, 3], x -> x + 1)", [2, None, 4]),
        ("SELECT filter(array(1,2,3,4), x -> x % 2 = 0) AS r",
         "SELECT list_filter([1,2,3,4], x -> x % 2 = 0)", [2, 4]),
        ("SELECT filter(array(1, NULL, 3), x -> x > 1) AS r",
         "SELECT list_filter([1, NULL, 3], x -> x > 1)", [3]),
        ("SELECT aggregate(array(1,2,3), 0, (a, x) -> a + x) AS r",
         "SELECT list_reduce([0,1,2,3], (a, x) -> a + x)", 6),
        ("SELECT aggregate(array(1, NULL, 3), 0, (a, x) -> a + x) AS r",
         "SELECT list_reduce([0, 1, NULL, 3], (a, x) -> a + x)", None),
    ]
    for ssql, dsql, want in cases:
        s = spark.sql(ssql).collect()[0].r
        d = con.execute(dsql).fetchone()[0]
        assert s == d == want, (ssql, s, d)


def test_dot_product_substrate_pair_is_exact(spark):
    """The ANN oracle pairing, distilled: same doubles, same result,
    both spellings."""
    con = _duck()
    s = spark.sql(
        "SELECT aggregate(zip_with(array(1.0D,2.0D,0.5D),"
        " array(3.0D,4.0D,8.0D), (a,b) -> a*b), 0.0D,"
        " (a,x) -> a+x) AS r"
    ).collect()[0].r
    d = con.execute(
        "SELECT list_reduce(list_prepend(0.0::DOUBLE,"
        " list_transform(list_zip([1.0,2.0,0.5],[3.0,4.0,8.0]),"
        " t -> t[1]::DOUBLE * t[2]::DOUBLE)), (a,x) -> a+x)"
    ).fetchone()[0]
    assert s == d == 15.0


def test_lambda_index_base_dialect(spark):
    """THE index dialect: Spark 0-based, DuckDB 1-based."""
    con = _duck()
    s = spark.sql(
        "SELECT transform(array(10,20), (x, i) -> x + i) AS r"
    ).collect()[0].r
    d = con.execute(
        "SELECT list_transform([10,20], (x, i) -> x + i)"
    ).fetchone()[0]
    assert s == [10, 21] and d == [11, 22]


def test_no_graded_plan_uses_indexed_lambda():
    """Census for the dialect above: the two-arg lambda index form
    must not appear in any oracle (the Spark side would need an
    explicit base correction)."""
    import re  # noqa: PLC0415

    from pipeline_airflow_docker_spark import plans  # noqa: PLC0415

    for key, sql in plans.ORACLES.items():
        assert not re.search(
            r"list_transform\s*\([^,]+,\s*\(\s*\w+\s*,\s*\w+\s*\)", sql
        ), key


def test_element_access_pairing_rules(spark):
    """element_at(a,n) == DuckDB a[n] (1-based, negative,
    out-of-range NULL); Spark's own bracket is 0-based — pinned so
    oracles never pair brackets with brackets."""
    con = _duck()
    s = spark.sql(
        "SELECT element_at(array(10,20,30), 1) AS a,"
        " element_at(array(10,20,30), -1) AS b,"
        " element_at(array(10), 5) AS c,"
        " array(10,20,30)[0] AS d,"          # Spark bracket: 0-based
        " array_position(array('a','b'), 'b') AS e,"
        " slice(array(1,2,3,4), 2, 2) AS f,"
        " flatten(array(array(1,2), array(3))) AS g,"
        " sequence(1, 5) AS h"
    ).collect()[0]
    d = con.execute(
        "SELECT ([10,20,30])[1], ([10,20,30])[-1], ([10])[5],"
        " list_position(['a','b'], 'b'), ([1,2,3,4])[2:3],"
        " flatten([[1,2],[3]]), range(1, 6)"
    ).fetchone()
    assert s.a == d[0] == 10 and s.b == d[1] == 30
    assert s.c is None and d[2] is None
    assert s.d == 10                       # bracket 0 == element_at 1
    assert s.e == d[3] == 2
    assert s.f == d[4] == [2, 3]
    assert s.g == d[5] == [1, 2, 3]
    assert s.h == d[6] == [1, 2, 3, 4, 5]


def test_duckdb_list_aggregate_skips_nulls_in_engine_divergence():
    """list_aggregate('sum') skips NULLs; list_reduce propagates —
    oracles mirroring F.aggregate must use list_reduce."""
    con = _duck()
    skip = con.execute(
        "SELECT list_aggregate([1, NULL, 3], 'sum')"
    ).fetchone()[0]
    prop = con.execute(
        "SELECT list_reduce([0, 1, NULL, 3], (a, x) -> a + x)"
    ).fetchone()[0]
    assert skip == 4 and prop is None


def test_nfc_nfd_distinct_everywhere_both_engines(spark):
    """Codepoint comparison in both engines: NFC and NFD forms of
    the same visible text differ under =, length, upper, GROUP BY,
    and md5 — the content-addressed-dedup fact."""
    con = _duck()
    assert NFC != NFD and NFC.encode() != NFD.encode()
    s = spark.sql(
        f"SELECT '{NFC}' = '{NFD}' AS eq,"
        f" length('{NFC}') AS ln_c, length('{NFD}') AS ln_d,"
        f" upper('{NFC}') = upper('{NFD}') AS up,"
        f" md5('{NFC}') = md5('{NFD}') AS h,"
        f" (SELECT count(*) FROM (SELECT t FROM VALUES ('{NFC}'),"
        f" ('{NFD}') v(t) GROUP BY t)) AS grp"
    ).collect()[0]
    d = con.execute(
        f"SELECT '{NFC}' = '{NFD}', length('{NFC}'), length('{NFD}'),"
        f" upper('{NFC}') = upper('{NFD}'), md5('{NFC}') = md5('{NFD}'),"
        f" (SELECT count(*) FROM (SELECT t FROM (VALUES ('{NFC}'),"
        f" ('{NFD}')) v(t) GROUP BY t))"
    ).fetchone()
    assert (s.eq, s.ln_c, s.ln_d, s.up, s.h, s.grp) == (
        False, 4, 5, False, False, 2
    )
    assert tuple(d) == (False, 4, 5, False, False, 2)
    # DuckDB can normalize; Spark cannot (no such function) — if
    # Spark grows one, a normalization-aware dedup mode becomes a
    # SQL expression instead of a Pandas UDF.
    assert con.execute(
        f"SELECT nfc_normalize('{NFD}') = '{NFC}'"
    ).fetchone()[0] is True
    from pyspark.errors import AnalysisException  # noqa: PLC0415
    import pytest as _pytest  # noqa: PLC0415

    with _pytest.raises(AnalysisException):
        spark.sql("SELECT normalize('x', 'NFC')").collect()
