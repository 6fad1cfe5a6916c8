"""Property-based semantics tests (SURVEY.md §5.2-5, hypothesis).

Algebraic laws the engine's core operators must satisfy on *arbitrary*
data, not just the checked-in fixtures:

- dedup/upsert idempotence:  upsert(upsert(X)) == upsert(X)
- filter containment:        filter(X) ⊆ X, and filter is idempotent
- ragged-union totality:     |union(A,B)| == |A|+|B|, columns = cols(A) ∪ cols(B),
                             null-fill exactly on the missing side
- dropna complement:         dropna_any(X) ∪ kept-out rows == X

Frames are built from generated Python rows via ``createDataFrame`` —
hypothesis drives the *data*, Spark executes the *same plans* the
production operators emit. Examples are kept small (Spark job per
example is ~100 ms; max_examples trades coverage for wall-clock).
"""

from __future__ import annotations

import pytest

try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st
except ImportError:  # pragma: no cover
    pytest.skip("hypothesis not installed", allow_module_level=True)

from pyspark.sql import functions as F

from pipeline_airflow_docker_spark.operators import (
    drop_null_rows,
    latest_by_key,
    require_keys,
    union_ragged,
)

SLOW = settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

# (id, ts, payload) rows; ids and ts collide on purpose so upsert has
# real work and ties exercise the deterministic tiebreak.
ROWS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),
        st.integers(min_value=0, max_value=3),
        st.one_of(st.none(), st.text(alphabet="abc", max_size=3)),
    ),
    min_size=1,
    max_size=30,
)


def _frame(spark, rows):
    return spark.createDataFrame(
        [(i, t, p) for i, t, p in rows], "id INT, ts INT, payload STRING"
    )


def _sorted(rows):
    """Row tuples sorted with None-safe total order."""
    return sorted(
        (tuple(r) for r in rows),
        key=lambda t: tuple((v is not None, v) for v in t),
    )


@SLOW
@given(rows=ROWS)
def test_upsert_idempotent_and_unique(spark, rows):
    df = _frame(spark, rows)
    once = latest_by_key(df, keys=["id"], order_by=["ts"], tiebreak=["payload"])
    twice = latest_by_key(once, keys=["id"], order_by=["ts"], tiebreak=["payload"])
    got_once = _sorted(once.collect())
    got_twice = _sorted(twice.collect())
    assert got_once == got_twice  # idempotent
    ids = [r[0] for r in got_once]
    assert len(ids) == len(set(ids)) == len({i for i, _, _ in rows})  # one row per key
    # the winner is the max (ts, payload) pair for its key — LWW
    for i, t, p in got_once:
        candidates = [(rt, rp) for ri, rt, rp in rows if ri == i]
        # Spark desc() sorts nulls last => null loses to any string
        assert (t, p) == max(
            candidates, key=lambda c: (c[0], c[1] is not None, c[1] or "")
        )


@SLOW
@given(rows=ROWS)
def test_filter_contained_and_idempotent(spark, rows):
    df = _frame(spark, rows)
    kept = require_keys(df, ["payload"])
    kept_rows = _sorted(kept.collect())
    all_rows = _sorted(df.collect())
    assert all(r in all_rows for r in kept_rows)  # containment
    assert _sorted(require_keys(kept, ["payload"]).collect()) == kept_rows
    assert all(r[2] is not None for r in kept_rows)


@SLOW
@given(rows=ROWS)
def test_dropna_any_partitions_the_frame(spark, rows):
    df = _frame(spark, rows)
    kept = drop_null_rows(df, how="any").count()
    dropped = df.filter(F.col("payload").isNull()).count()  # only nullable col
    assert kept + dropped == len(rows)


@SLOW
@given(
    left=st.lists(st.tuples(st.integers(0, 9), st.text(alphabet="xy", max_size=2)),
                  min_size=0, max_size=10),
    right=st.lists(st.tuples(st.integers(0, 9), st.booleans()),
                   min_size=0, max_size=10),
)
def test_union_ragged_totality(spark, left, right):
    if not left or not right:
        return  # createDataFrame needs rows to carry the schema here
    a = spark.createDataFrame(left, "k INT, name STRING")
    b = spark.createDataFrame(right, "k INT, flag BOOLEAN")
    u = union_ragged(a, b)
    assert u.count() == len(left) + len(right)
    assert u.columns == ["k", "name", "flag"]  # left cols, then new right cols
    # null-fill lands exactly on the side that lacked the column
    assert u.filter(F.col("flag").isNull()).count() == len(left)
    assert u.filter(F.col("name").isNull()).count() == len(right)


@given(
    texts=st.lists(
        st.text(
            alphabet=st.characters(
                whitelist_categories=("Lu", "Ll", "Nd", "Zs"),
                whitelist_characters="@.+-()<>_%",
            ),
            max_size=80,
        ),
        min_size=1,
        max_size=8,
    )
)
@SLOW
def test_redact_pii_idempotent(spark, texts):
    """redact(redact(X)) == redact(X): replacement tokens contain no
    digits or '@', so no pattern can ever match already-redacted
    output."""
    from pipeline_airflow_docker_spark.operators.redact import redact_pii

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id BIGINT, text STRING"
    )
    once = redact_pii(df).select("doc_id", "text")
    twice = redact_pii(once).select("doc_id", "text")
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 10_000), st.sampled_from(["a", "b", "c"])),
        min_size=1,
        max_size=40,
        unique_by=lambda r: r[0],
    ),
    cap=st.integers(1, 5),
)
@SLOW
def test_stratified_downsample_properties(spark, rows, cap):
    """Cap respected per group; output ⊆ input; deterministic under
    re-partitioning."""
    from pipeline_airflow_docker_spark.operators.splits import (
        stratified_downsample,
    )

    df = spark.createDataFrame(rows, "k BIGINT, grp STRING")
    out = stratified_downsample(df, "grp", cap, key_col="k")
    got = [(r.k, r.grp) for r in out.collect()]
    per_group: dict[str, int] = {}
    for _, g in got:
        per_group[g] = per_group.get(g, 0) + 1
    assert all(n <= cap for n in per_group.values())
    assert set(got) <= set(rows)
    for g in {r[1] for r in rows}:
        assert per_group.get(g, 0) == min(cap, sum(1 for r in rows if r[1] == g))
    again = stratified_downsample(df.repartition(5), "grp", cap, key_col="k")
    assert sorted(got) == sorted((r.k, r.grp) for r in again.collect())
