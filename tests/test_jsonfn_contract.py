"""The JSON-function-family cross-engine contract (round 15).

Graded JSON surfaces: q_fn_json / q_json_roundtrip parse and emit
JSON, and q_fn_map's oracle guards with DuckDB json_valid over
events.props. The r15 probe ran the extraction/emission family edge
by edge:

**AGREE (the graded subset):**
- get_json_object(s, '$.k') == json_extract_string(s, '$.k') for
  scalar, nested, array-index, and quoted-key-with-space paths;
  MISSING key and JSON-null both -> SQL NULL; \\uXXXX escapes decode
  identically; object/array sub-extraction renders in the SAME
  compact form ('{"c":"x"}', '[10,20,30]').
- Number rendering through extraction agrees inside the double-safe
  window: '1.5', '1.0', '0.1' verbatim; '1e2' -> '100.0' BOTH
  (both engines re-render small scalars through double).
- DUPLICATE KEYS: first occurrence wins in BOTH engines.
- Out-of-range array index -> NULL both; json_array_length and
  object-keys (order-preserving) agree.
- to_json on null-free structs agrees ('{"a":1,"b":"x"}', unicode
  pass-through, 1.5 rendering).

**DIALECTS (pinned discriminators):**
- MALFORMED input: Spark's parser is LENIENT (truncated -> NULL,
  trailing garbage and single-quoted keys ACCEPTED) while DuckDB
  raises InvalidInputException — which is exactly why oracles guard
  with json_valid() (q_fn_map does; Spark has no json_valid
  function, its plans rely on get_json_object's NULL-on-malformed).
  Note DuckDB json_valid also rejects the single-quote/trailing-
  garbage forms Spark ACCEPTS: the guard is strictly narrower, so
  fixture JSON must be strict-valid (it is — emitted by to_json).
- BIG integers: Spark extracts integer text VERBATIM
  ('123456789012345678901'); DuckDB routes through double
  ('123456789012345680000.0'). The double-render twin of SCALE.md
  §18 — JSON-embedded int64+ values are not portably extractable.
- Exponent case: Spark 'E308' vs DuckDB 'e308' on extraction.
- Path syntax: bare keys (no '$.') resolve in DuckDB only; bracket
  notation spells $['a'] (Spark/Java) vs $."a" (DuckDB); negative
  array indices spell [-1] (Spark: NULL — unsupported) vs [#-1]
  (DuckDB: works).
- to_json NULL members: **Spark DROPS them, DuckDB keeps
  "k":null** — any graded JSON emission must be null-free by
  construction (census below).
- to_json big doubles ('1.0E16' vs '10000000000000000.0') and
  timestamps ('2024-01-02T03:04:05.000Z' vs '2024-01-02 03:04:05')
  are dialects — graded to_json payloads carry strings/small
  numerics only.

Probe provenance: /tmp/probe_json_r15.py run 2026-08-16; SCALE.md
§23.
"""

from __future__ import annotations

import duckdb
import pytest

J = (
    '{"a": 1, "b": {"c": "x"}, "arr": [10, 20, 30], "n": null,'
    ' "s": "caf\\u00e9"}'
)


def _duck():
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    return con


def test_extraction_common_subset_agrees(spark):
    con = _duck()
    cases = [
        ("$.a", "1"),
        ("$.b.c", "x"),
        ("$.arr[1]", "20"),
        ("$.zzz", None),
        ("$.n", None),
        ("$.s", "café"),
        ("$.b", '{"c":"x"}'),
        ("$.arr", "[10,20,30]"),
        ("$.arr[9]", None),
    ]
    for path, want in cases:
        s = spark.sql(
            f"SELECT get_json_object('{J}', '{path}') AS r"
        ).collect()[0].r
        d = con.execute(
            f"SELECT json_extract_string('{J}', '{path}')"
        ).fetchone()[0]
        assert s == d == want, (path, s, d)


def test_number_rendering_window_and_big_int_dialect(spark):
    con = _duck()
    for doc, want in [
        ('{"x": 1.5}', "1.5"),
        ('{"x": 1.0}', "1.0"),
        ('{"x": 0.1}', "0.1"),
        ('{"x": 1e2}', "100.0"),      # both re-render through double
    ]:
        s = spark.sql(
            f"SELECT get_json_object('{doc}', '$.x') AS r"
        ).collect()[0].r
        d = con.execute(
            f"SELECT json_extract_string('{doc}', '$.x')"
        ).fetchone()[0]
        assert s == d == want, (doc, s, d)
    # Discriminator: 21-digit integer — verbatim vs via-double.
    big = '{"x": 123456789012345678901}'
    s = spark.sql(
        f"SELECT get_json_object('{big}', '$.x') AS r"
    ).collect()[0].r
    d = con.execute(
        f"SELECT json_extract_string('{big}', '$.x')"
    ).fetchone()[0]
    assert s == "123456789012345678901"
    assert d == "123456789012345680000.0"


def test_duplicate_keys_first_wins_both(spark):
    con = _duck()
    dup = '{"k": 1, "k": 2}'
    s = spark.sql(
        f"SELECT get_json_object('{dup}', '$.k') AS r"
    ).collect()[0].r
    d = con.execute(
        f"SELECT json_extract_string('{dup}', '$.k')"
    ).fetchone()[0]
    assert s == d == "1"


def test_malformed_handling_dialect_and_json_valid_guard(spark):
    """Spark lenient (NULL / even accepts), DuckDB raises; json_valid
    is the oracle-side guard and is STRICTER than Spark's parser."""
    con = _duck()
    trunc, trail, singleq = '{"a": 1', '{"a":1}x', "{'a':1}"
    s_rows = spark.sql(
        "SELECT get_json_object('{\"a\": 1', '$.a') AS t,"
        " get_json_object('{\"a\":1}x', '$.a') AS g,"
        " get_json_object(\"{'a':1}\", '$.a') AS q"
    ).collect()[0]
    assert s_rows.t is None           # truncated -> NULL
    assert s_rows.g == "1"            # trailing garbage ACCEPTED
    assert s_rows.q == "1"            # single quotes ACCEPTED
    for doc in (trunc, trail, singleq):
        with pytest.raises(duckdb.InvalidInputException):
            con.execute(
                "SELECT json_extract_string(?, '$.a')", [doc]
            )
        assert con.execute(
            "SELECT json_valid(?)", [doc]
        ).fetchone()[0] is False


def test_path_syntax_dialects(spark):
    con = _duck()
    # bare key: DuckDB resolves, Spark NULL
    s = spark.sql(f"SELECT get_json_object('{J}', 'a') AS r").collect()[0].r
    d = con.execute(f"SELECT json_extract_string('{J}', 'a')").fetchone()[0]
    assert s is None and d == "1"
    # negative index: Spark NULL; DuckDB spells [#-1]
    s = spark.sql(
        f"SELECT get_json_object('{J}', '$.arr[-1]') AS r"
    ).collect()[0].r
    d = con.execute(
        f"SELECT json_extract_string('{J}', '$.arr[#-1]')"
    ).fetchone()[0]
    assert s is None and d == "30"
    # quoted-key-with-space: both work, different spellings
    doc = '{"a b": 7}'
    s = spark.sql(
        f"SELECT get_json_object('{doc}', \"$['a b']\") AS r"
    ).collect()[0].r
    d = con.execute(
        f"SELECT json_extract_string('{doc}', '$.\"a b\"')"
    ).fetchone()[0]
    assert s == d == "7"


def test_to_json_null_member_dialect(spark):
    """Spark drops null struct members; DuckDB emits "k":null. The
    reason graded JSON emission is null-free by construction."""
    con = _duck()
    s = spark.sql(
        "SELECT to_json(named_struct('a', CAST(NULL AS INT), 'b', 2)) AS r"
    ).collect()[0].r
    d = con.execute(
        "SELECT to_json({'a': NULL::INT, 'b': 2})::VARCHAR"
    ).fetchone()[0]
    assert s == '{"b":2}' and d == '{"a":null,"b":2}'
    # the null-free pair agrees:
    s2 = spark.sql(
        "SELECT to_json(named_struct('a', 1, 'b', 'x')) AS r"
    ).collect()[0].r
    d2 = con.execute(
        "SELECT to_json({'a': 1, 'b': 'x'})::VARCHAR"
    ).fetchone()[0]
    assert s2 == d2 == '{"a":1,"b":"x"}'


def test_graded_json_emission_is_nullfree_or_guarded():
    """Census: every oracle that compares to_json output must build
    it from non-null expressions (coalesce/literals) — scan for
    to_json in oracles and require no bare nullable column feeds it.
    Heuristic: the oracle text around any to_json( must not contain
    a bare NULL literal argument."""
    import re  # noqa: PLC0415

    from pipeline_airflow_docker_spark import plans  # noqa: PLC0415

    for key, sql in plans.ORACLES.items():
        for m in re.finditer(r"to_json\s*\(", sql, re.I):
            frag = sql[m.start():m.start() + 200].lower()
            assert "null::" not in frag and " null " not in frag, (
                key, frag
            )
