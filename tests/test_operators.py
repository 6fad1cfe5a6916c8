"""Semantics unit tests for the operator library — the pandas<->Spark
parity traps called out in SURVEY.md §7 ("what's hard" #1) plus the
upsert/gate/json edge cases, on tiny literal DataFrames."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from pipeline_airflow_docker_spark.operators import (
    drop_null_rows,
    enrich,
    json_deserialize,
    json_serialize,
    latest_by_key,
    nest_struct,
    require_keys,
    union_ragged,
)
from pipeline_airflow_docker_spark.operators.quality import count_gate


def test_dropna_treats_nan_like_null(spark):
    # pandas dropna drops both NaN and None; Spark's na.drop must too.
    df = spark.createDataFrame(
        [(1, 1.0), (2, float("nan")), (3, None)], "id INT, x DOUBLE"
    )
    kept = drop_null_rows(df, how="any").select("id").collect()
    assert [r.id for r in kept] == [1]


def test_dropna_all_keeps_partial_rows(spark):
    df = spark.createDataFrame(
        [(None, None), ("a", None), (None, 1.0)], "s STRING, x DOUBLE"
    )
    assert drop_null_rows(df, how="all").count() == 2


def test_union_ragged_column_order_matches_pandas_concat(spark):
    # pd.concat result order: df1's columns, then df2's new columns.
    df1 = spark.createDataFrame([("jan", 340)], "Month STRING, y1958 INT")
    df2 = spark.createDataFrame([("Doe", 88.5)], "last_name STRING, Final DOUBLE")
    out = union_ragged(df1, df2)
    assert out.columns == ["Month", "y1958", "last_name", "Final"]
    rows = out.orderBy(F.col("Month").asc_nulls_last()).collect()
    assert rows[0] == Row(Month="jan", y1958=340, last_name=None, Final=None)
    assert rows[1] == Row(Month=None, y1958=None, last_name="Doe", Final=88.5)


def test_require_keys_filters_missing(spark):
    df = spark.createDataFrame(
        [(1, "t", "b"), (2, None, "b"), (3, "t", None)],
        "id INT, title STRING, body STRING",
    )
    assert [r.id for r in require_keys(df, ["id", "title", "body"]).collect()] == [1]


def test_latest_by_key_last_writer_wins(spark):
    df = spark.createDataFrame(
        [(1, 10, "old"), (1, 20, "new"), (2, 5, "only")],
        "id INT, ts INT, payload STRING",
    )
    out = {r.id: r.payload for r in latest_by_key(df, ["id"], ["ts"]).collect()}
    assert out == {1: "new", 2: "only"}


def test_latest_by_key_idempotent(spark):
    df = spark.createDataFrame(
        [(1, 10, "a"), (1, 20, "b"), (1, 20, "c"), (2, 1, "d")],
        "id INT, ts INT, payload STRING",
    )
    once = latest_by_key(df, ["id"], ["ts"], tiebreak=["payload"])
    twice = latest_by_key(once, ["id"], ["ts"], tiebreak=["payload"])
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))


def test_count_gate_skip_branch_is_empty_same_schema(spark):
    df = spark.createDataFrame([(1,)], "id INT")
    gated = count_gate(df, min_rows=10)
    assert gated.count() == 0 and gated.schema == df.schema
    assert count_gate(df, min_rows=0).count() == 1


def test_enrich_adds_provenance(spark):
    df = spark.createDataFrame([(1,)], "id INT")
    out = enrich(df, source="api", status="raw", ts=F.to_timestamp(F.lit("2024-01-01 00:00:09")))
    row = out.collect()[0]
    assert row.processed_timestamp == "2024-01-01T00:00:09"
    assert row.source == "api" and row.data_status == "raw"


def test_nest_struct_shape(spark):
    df = spark.createDataFrame([(1, "t")], "id INT, title STRING")
    out = nest_struct(df, ts=F.to_timestamp(F.lit("2024-01-01 00:00:00")))
    assert out.columns == ["original_data", "processed_at", "status"]
    row = out.collect()[0]
    assert row.original_data.id == 1 and row.original_data.title == "t"
    assert row.status == "processed"


def test_json_roundtrip_and_corrupt_record(spark):
    df = spark.createDataFrame([(1, "x")], "id INT, s STRING")
    ser = json_serialize(df)
    assert ser.collect()[0].value == '{"id":1,"s":"x"}'
    from pyspark.sql.types import IntegerType, StringType, StructField, StructType

    schema = StructType([StructField("id", IntegerType()), StructField("s", StringType())])
    back = json_deserialize(ser, schema)
    assert back.collect()[0] == Row(id=1, s="x")
    # corrupt record -> nulls, not a crash (the reference crashed).
    bad = spark.createDataFrame([("{not json",)], "value STRING")
    assert json_deserialize(bad, schema).collect()[0] == Row(id=None, s=None)


def test_sessionize_gap_boundaries(spark):
    """Events exactly at the gap stay in-session; one past it start a
    new session; numbering is per-key and 0-based."""
    from pipeline_airflow_docker_spark.operators.intervals import sessionize

    rows = [
        (1, 10, "2024-01-01 00:00:00"),
        (1, 11, "2024-01-01 00:30:00"),   # == gap -> same session
        (1, 12, "2024-01-01 01:00:01"),   # > gap  -> new session
        (2, 20, "2024-01-01 09:00:00"),
    ]
    df = spark.createDataFrame(
        rows, "user_id LONG, event_id LONG, ts_s STRING"
    ).withColumn("ts", F.col("ts_s").cast("timestamp")).drop("ts_s")
    out = {
        (r.user_id, r.event_id): r.session_idx
        for r in sessionize(
            df, ["user_id"], "ts", 1800, order_tiebreakers=["event_id"]
        ).collect()
    }
    assert out == {(1, 10): 0, (1, 11): 0, (1, 12): 1, (2, 20): 0}


def test_sessionize_index_is_bigint(spark):
    """Red fence (r12, the global_row_index int32 class): session_idx
    is a per-key running count — OUR narrowing, unlike Spark's
    int-typed row_number — and a hot key past 2.147B sessions would
    wrap silently under ansi.enabled=false. Must be LongType."""
    from pyspark.sql.types import LongType

    from pipeline_airflow_docker_spark.operators.intervals import sessionize

    df = spark.createDataFrame(
        [(1, 10, "2024-01-01 00:00:00")], "user_id LONG, event_id LONG, ts_s STRING"
    ).withColumn("ts", F.col("ts_s").cast("timestamp")).drop("ts_s")
    out = sessionize(df, ["user_id"], "ts", 1800, order_tiebreakers=["event_id"])
    assert isinstance(out.schema["session_idx"].dataType, LongType)


def test_sessionize_single_exchange(spark, sf_dir):
    """Both window passes share one spec -> exactly one shuffle."""
    from pipeline_airflow_docker_spark.catalog import table
    from pipeline_airflow_docker_spark.operators.intervals import sessionize

    ev = table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts"
    )
    df = sessionize(ev, ["user_id"], "ts", 1800, order_tiebreakers=["event_id"])
    plan = spark._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    tree = plan.split("\n\n")[0]  # operator tree (details repeat names)
    assert tree.count("Exchange") == 1, plan


def test_histogram_fixed_mass_edges_and_clamp(spark):
    """Counts sum to the input size including clamped out-of-range
    values; edges follow the integer grid; non-dividing spans reject."""
    import pytest
    from pipeline_airflow_docker_spark.operators.profile import histogram_fixed

    vals = [(-5.0,), (0.0,), (0.99,), (1.0,), (9.99,), (10.0,), (99.0,), (250.0,)]
    df = spark.createDataFrame(vals, "v DOUBLE")
    out = {r.bin: r for r in histogram_fixed(df, "v", 0.0, 100.0, 10).collect()}
    assert sum(r.n for r in out.values()) == len(vals)
    # width 10, bins [0,10), [10,20), ... [90,100); out-of-range
    # clamps into the edge bins.
    assert out[0].n == 5          # -5 (clamped), 0, 0.99, 1.0, 9.99
    assert out[1].n == 1          # 10.0 (bin 0's exclusive upper edge)
    assert out[9].n == 2          # 99.0, 250.0 (clamped)
    assert (out[0].bin_lo, out[0].bin_hi) == (0.0, 10.0)
    assert (out[9].bin_lo, out[9].bin_hi) == (90.0, 100.0)

    with pytest.raises(ValueError, match="divide evenly"):
        histogram_fixed(df, "v", 0.0, 100.0, 7)
    with pytest.raises(ValueError, match="hi > lo"):
        histogram_fixed(df, "v", 100.0, 100.0, 5)


def test_impute_group_mean_fills_center_and_respects_empty_groups(spark):
    """Nulls inherit their own group's mean (decimal-exact); a group
    with no observed values stays NULL; non-null values pass through
    untouched."""
    from pipeline_airflow_docker_spark.operators.cleaning import impute_group_mean

    df = spark.createDataFrame(
        [
            ("a", 1, 10.0),
            ("a", 2, None),
            ("a", 3, 30.0),
            ("b", 4, 7.5),
            ("c", 5, None),  # group c has no observed values
        ],
        "g STRING, id INT, v DOUBLE",
    )
    out = {r.id: r.v for r in impute_group_mean(df, ["g"], "v").collect()}
    assert out[1] == 10.0 and out[3] == 30.0 and out[4] == 7.5
    assert out[2] == 20.0          # mean of group a
    assert out[5] is None          # nothing to impute from

    import pytest as _pytest

    with _pytest.raises(ValueError, match="group column"):
        impute_group_mean(df, [], "v")


def test_scd2_intervals_chain_tiles_and_single_current(spark):
    """SCD2 contract (operators/intervals.py::scd2_intervals): per key
    the versions chain half-open [valid_from, valid_to) with
    valid_to == the next version's valid_from, exactly ONE current
    (NULL valid_to) row per key — the one with the max (ts, tiebreak)
    — and a ts tie collapses the earlier tiebreaker version to a
    zero-width interval rather than duplicating currency."""
    from pipeline_airflow_docker_spark.operators.intervals import scd2_intervals

    rows = [
        (1, 101, "2024-01-01 10:00:00"),
        (1, 102, "2024-01-01 11:00:00"),
        (1, 103, "2024-01-01 11:00:00"),  # ts tie -> event_id breaks it
        (2, 201, "2024-01-01 09:00:00"),
    ]
    df = spark.createDataFrame(
        rows, "user_id LONG, event_id LONG, ts_s STRING"
    ).withColumn("ts", F.col("ts_s").cast("timestamp")).drop("ts_s")
    out = scd2_intervals(
        df, ["user_id"], "ts", order_tiebreakers=["event_id"]
    ).collect()

    by_key: dict[int, list] = {}
    for r in sorted(out, key=lambda r: (r.user_id, r.valid_from, r.event_id)):
        by_key.setdefault(r.user_id, []).append(r)

    for key, chain in by_key.items():
        # Chain tiles: each valid_to is the successor's valid_from.
        for prev, nxt in zip(chain, chain[1:]):
            assert prev.valid_to == nxt.valid_from, (key, prev, nxt)
        # Exactly one current version per key, and it's the last.
        currents = [r for r in chain if r.is_current]
        assert len(currents) == 1 and currents[0] is chain[-1], chain
        assert all(r.valid_to is not None for r in chain[:-1])

    # The tie: 102 becomes a zero-width [11:00, 11:00) version; 103 is
    # the current one. As-of lookup at 11:00 therefore resolves to 103.
    k1 = {r.event_id: r for r in by_key[1]}
    assert k1[102].valid_from == k1[102].valid_to
    assert not k1[102].is_current and k1[103].is_current


def test_asof_join_at_or_before_and_no_prior_view(spark, tmp_path):
    """As-of contract (plans/relational.py::q_join_asof): a view at
    EXACTLY the click's timestamp matches (at-or-before, pinned by the
    __kind sort key), a click with no prior view keeps a NULL
    last_view_ts instead of vanishing, and the match is the latest
    qualifying view per user."""
    from pipeline_airflow_docker_spark.plans.relational import q_join_asof

    rows = [
        # user 1: view at the click's exact ts -> must match
        (1, 1, "view", "2024-01-01 10:00:00"),
        (2, 1, "click", "2024-01-01 10:00:00"),
        # user 2: the only view comes AFTER the click -> NULL
        (3, 2, "click", "2024-01-01 10:00:00"),
        (4, 2, "view", "2024-01-01 11:00:00"),
        # user 3: two prior views -> latest one wins
        (5, 3, "view", "2024-01-01 09:00:00"),
        (6, 3, "view", "2024-01-01 10:00:00"),
        (7, 3, "click", "2024-01-01 10:30:00"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id LONG, user_id LONG, event_type STRING, ts_s STRING"
    ).withColumn("ts", F.col("ts_s").cast("timestamp")).drop("ts_s")
    ev.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))

    got = {
        r.event_id: (None if r.last_view_ts is None else str(r.last_view_ts))
        for r in q_join_asof(spark, str(tmp_path)).collect()
    }
    assert got == {
        2: "2024-01-01 10:00:00",
        3: None,
        7: "2024-01-01 10:00:00",
    }
