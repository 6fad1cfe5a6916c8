"""Tests for operators/profile.py — column profiling and z-score
outlier screening."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from pipeline_airflow_docker_spark.operators.profile import (
    profile_columns,
    zscore_outliers,
)


def test_profile_shapes_and_values(spark):
    df = spark.createDataFrame(
        [(1, 2.0, "a"), (2, None, "b"), (3, 4.0, "b"), (None, 8.0, None)],
        "id bigint, v double, s string",
    )
    out = {r["column_name"]: r.asDict() for r in profile_columns(df, ["id", "v", "s"]).collect()}
    assert set(out) == {"id", "v", "s"}
    assert out["id"]["n_rows"] == 4 and out["id"]["n_nonnull"] == 3
    assert out["v"]["n_distinct"] == 3
    assert out["v"]["min_num"] == 2.0 and out["v"]["max_num"] == 8.0
    # Numeric columns report via min_num/max_num; strings via min_str/max_str.
    assert out["v"]["min_str"] is None and out["s"]["min_num"] is None
    assert out["s"]["min_str"] == "a" and out["s"]["max_str"] == "b"
    assert out["s"]["n_nonnull"] == 3 and out["s"]["n_distinct"] == 2


def test_profile_unknown_column_raises(spark):
    df = spark.range(3)
    with pytest.raises(ValueError, match="unknown columns"):
        profile_columns(df, ["id", "nope"])


def test_profile_single_pass_one_scan(spark):
    """The whole profile must come from ONE aggregate over ONE scan —
    no per-column subplans unioned together."""
    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 7).cast("double").alias("v")
    )
    explained = (
        profile_columns(df, ["id", "v"])._jdf.queryExecution().executedPlan().toString()
    )
    assert explained.count("Range (0, 100") == 1
    assert "Union" not in explained


def test_profile_no_expand_either_path(spark):
    """r18: the exact path no longer uses the multi-countDistinct
    Expand (Expand ×(n+1) fed three SortAggregate layers plus a Sort of
    the expanded rows — the slowest plan in the registry); both paths
    must now plan Expand-free, and the exact path must aggregate with
    hash aggregates, not sort aggregates.

    Scope: the no-SortAggregate assertion holds for NUMERIC-only
    profiles (this fixture). Profiling a string column legitimately
    plans one SortAggregate pair for the tiny per-idx min/max
    finalization (string agg buffers are not hash-aggregable) — over
    the already-collapsed distinct table, not the exploded rows; see
    plans/r18/q_profile_after.txt nodes (13)/(16)."""
    df = spark.range(1000).select(
        F.col("id"), (F.col("id") % 13).cast("double").alias("v")
    )
    exact = profile_columns(df, ["id", "v"], exact_distinct=True)
    approx = profile_columns(df, ["id", "v"], exact_distinct=False)
    exact_plan = exact._jdf.queryExecution().executedPlan().toString()
    approx_plan = approx._jdf.queryExecution().executedPlan().toString()
    assert "Expand" not in exact_plan
    assert "SortAggregate" not in exact_plan
    assert "Expand" not in approx_plan  # HLL++ path: pure one-pass
    # HLL++ on these cardinalities is exact enough to agree.
    a = {r["column_name"]: r["n_distinct"] for r in approx.collect()}
    assert a["v"] == 13
    e = {r["column_name"]: r["n_distinct"] for r in exact.collect()}
    assert e == {"id": 1000, "v": 13}


def test_profile_empty_input_keeps_one_row_per_column(spark):
    """The exploded-aggregate form yields no groups on empty input;
    the literal idx spine must keep the one-row-per-column contract
    (zero counts, NULL min/max) the wide-aggregate form had."""
    df = spark.createDataFrame([], "id bigint, v double, s string")
    out = {
        r["column_name"]: r.asDict()
        for r in profile_columns(df, ["id", "v", "s"]).collect()
    }
    assert set(out) == {"id", "v", "s"}
    for c in ("id", "v", "s"):
        assert out[c]["n_rows"] == 0
        assert out[c]["n_nonnull"] == 0
        assert out[c]["n_distinct"] == 0
        assert out[c]["min_num"] is None and out[c]["min_str"] is None


def test_profile_exact_distinct_normalizes_float_keys(spark):
    """countDistinct semantics on floats: -0.0 and 0.0 are ONE distinct
    value and every NaN is the same value — the explode/groupBy form
    must reproduce that (grouping normalizes the key copy) while
    min/max still see raw values."""
    df = spark.createDataFrame(
        [(1, -0.0), (2, 0.0), (3, float("nan")), (4, float("nan")), (5, 2.5)],
        "id bigint, v double",
    )
    exp = df.select(
        F.countDistinct("v").alias("nd"),
        F.min("v").alias("mn"),
        F.max("v").alias("mx"),
    ).collect()[0]
    got = {
        r["column_name"]: r.asDict()
        for r in profile_columns(df, ["id", "v"]).collect()
    }["v"]
    assert got["n_distinct"] == exp["nd"]
    assert got["min_num"] == exp["mn"]
    assert (got["max_num"] != got["max_num"]) == (exp["mx"] != exp["mx"])  # NaN


def test_profile_approx_semantics_vs_exact(spark):
    """HLL++ path contract, graded against the exact path on a real
    cardinality (20k distinct): ONLY n_distinct may differ, bounded by
    the sketch's rsd; every other statistic (n_rows, n_nonnull,
    min/max) must be IDENTICAL — both paths run the same exact
    aggregates for them. A tighter rsd knob must plan a bigger sketch
    yet stay inside its own (tighter) bound."""
    n = 20_000
    df = spark.range(n).select(
        F.col("id"),
        (F.col("id") % 997).cast("double").alias("v"),
        F.concat(F.lit("u"), (F.col("id") % 50).cast("string")).alias("s"),
    )
    cols = ["id", "v", "s"]
    exact = {
        r["column_name"]: r.asDict()
        for r in profile_columns(df, cols, exact_distinct=True).collect()
    }
    for rsd in (0.05, 0.01):
        approx = {
            r["column_name"]: r.asDict()
            for r in profile_columns(
                df, cols, exact_distinct=False, approx_rsd=rsd
            ).collect()
        }
        for c in cols:
            e, a = exact[c], approx[c]
            for stat in ("n_rows", "n_nonnull", "min_num", "max_num",
                         "min_str", "max_str"):
                assert a[stat] == e[stat], (c, stat, a[stat], e[stat])
            # 4 standard deviations of slack on the advertised rsd —
            # deterministic for a fixed dataset, so no flake.
            tol = 4 * rsd * e["n_distinct"]
            assert abs(a["n_distinct"] - e["n_distinct"]) <= max(tol, 1), (
                c, rsd, a["n_distinct"], e["n_distinct"])


def test_zscore_outliers_flags_the_planted_point(spark):
    rows = [("a", float(v)) for v in (10, 11, 9, 10, 12, 9, 10, 11, 100)]
    rows += [("b", 5.0), ("b", 6.0), ("b", 5.5), ("b", 4.5)]
    df = spark.createDataFrame(rows, "k string, v double")
    out = zscore_outliers(df, "k", "v", k=2.5).collect()
    assert [(r["k"], r["v"]) for r in out] == [("a", 100.0)]
    z = out[0]["z"]
    # Hand-checked: mean≈20.22, sd≈29.94 → z≈2.66
    assert 2.5 < z < 3.0 and math.isfinite(z)


def test_zscore_outliers_stats_side_is_broadcast(spark):
    df = spark.createDataFrame(
        [("a", float(i % 17)) for i in range(500)], "k string, v double"
    )
    plan = zscore_outliers(df, "k", "v")._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


# ---- vocabulary / ngram_counts (operators/textstats.py) -------------


def test_vocabulary_counts_and_tiebreak(spark):
    from pipeline_airflow_docker_spark.operators.textstats import vocabulary

    df = spark.createDataFrame(
        [(1, "a b a"), (2, "b c"), (3, "a")], "doc_id bigint, text string"
    )
    out = vocabulary(df, top_k=2).collect()
    # a: tf=3 df=2; b: tf=2 df=2; c: tf=1 — top-2 cut is (a, b).
    assert [(r["token"], r["tf"], r["df_docs"]) for r in out] == [
        ("a", 3, 2),
        ("b", 2, 2),
    ]
    # tf ties must break on token: x and y both tf=1 -> x wins the cut.
    df2 = spark.createDataFrame([(1, "y x")], "doc_id bigint, text string")
    top1 = vocabulary(df2, top_k=1).collect()
    assert top1[0]["token"] == "x"


def test_ngram_counts_skips_short_docs(spark):
    from pipeline_airflow_docker_spark.operators.textstats import ngram_counts

    df = spark.createDataFrame(
        [(1, "a b a b"), (2, "solo"), (3, "a b")], "doc_id bigint, text string"
    )
    out = {r["gram"]: r["cnt"] for r in ngram_counts(df, n=2, top_k=10).collect()}
    # doc 2 (1 token) contributes nothing; no "solo" unigram leaks in.
    assert out == {"a b": 3, "b a": 1}


# ---- bin_interval_join (operators/intervals.py) ----------------------


def _naive_interval_join(spark, points, intervals):
    from pyspark.sql import functions as F

    return points.join(
        intervals,
        on=(points["user_id"] == intervals["user_id"])
        & (points["ts"] >= intervals["lo"])
        & (points["ts"] < intervals["hi"]),
    ).select(points["event_id"], intervals["iv_id"])


def test_bin_interval_join_matches_naive_range_join(spark):
    import datetime as dt

    from pyspark.sql import functions as F

    from pipeline_airflow_docker_spark.operators.intervals import bin_interval_join

    base = dt.datetime(2024, 1, 1)
    pts = spark.createDataFrame(
        [(i, i % 3, base + dt.timedelta(minutes=7 * i)) for i in range(200)],
        "event_id bigint, user_id bigint, ts timestamp",
    )
    ivs = spark.createDataFrame(
        [
            (j, j % 3, base + dt.timedelta(minutes=45 * j),
             base + dt.timedelta(minutes=45 * j + 61))
            for j in range(20)
        ],
        "iv_id bigint, user_id bigint, lo timestamp, hi timestamp",
    )
    got = sorted(
        (r["event_id"], r["iv_id"])
        for r in bin_interval_join(
            pts, ivs, "ts", "lo", "hi", keys=["user_id"], bin_seconds=1800
        ).select("event_id", "iv_id").collect()
    )
    want = sorted(
        (r["event_id"], r["iv_id"])
        for r in _naive_interval_join(spark, pts, ivs).collect()
    )
    assert got == want and len(got) > 0


def test_bin_interval_join_plans_equi_join_not_nested_loop(spark):
    import datetime as dt

    from pipeline_airflow_docker_spark.operators.intervals import bin_interval_join

    base = dt.datetime(2024, 1, 1)
    pts = spark.createDataFrame(
        [(i, i % 3, base + dt.timedelta(minutes=i)) for i in range(50)],
        "event_id bigint, user_id bigint, ts timestamp",
    )
    ivs = pts.selectExpr(
        "event_id as iv_id", "user_id", "ts as lo", "ts + interval 1 hour as hi"
    )
    plan = (
        bin_interval_join(pts, ivs, "ts", "lo", "hi", keys=["user_id"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan
    assert any(j in plan for j in ("SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin"))
