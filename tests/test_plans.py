"""Physical-plan shape assertions — the 100 TB design review as tests.

Correct rows are necessary but not sufficient: these tests pin the
*plan* properties that decide whether a query survives a 1000-executor
scale-up (predicate pushdown, column pruning, broadcast joins, bounded
top-k, Arrow-vectorized Python)."""

from __future__ import annotations

import pytest

from pipeline_airflow_docker_spark.plans import QUERIES


def explain(spark, sf_dir, name: str) -> str:
    df = QUERIES[name](spark, sf_dir)
    return spark._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_flagship_pushes_filter_and_partial_agg(spark, sf_dir):
    plan = explain(spark, sf_dir, "q_agg_group")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # partial + final aggregation (map-side combine before the shuffle)
    assert plan.count("HashAggregate") >= 2
    # whole-stage codegen covers the scan->partial-agg pipeline
    df = QUERIES["q_agg_group"](spark, sf_dir)
    codegen = spark._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "codegen"
    )
    assert "WholeStageCodegen" in codegen


def test_filter_pred_pushdown_and_column_pruning(spark, sf_dir):
    plan = explain(spark, sf_dir, "q_filter_pred")
    assert "PushedFilters:" in plan and "l_shipdate" in plan
    # projection prunes to the 6 referenced columns — l_tax and
    # l_returnflag etc. must not be read into the scan schema beyond
    # what predicates/projection need.
    readschema = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
    assert "l_tax" not in readschema and "l_partkey" not in readschema


def test_join_inner_broadcasts_nation(spark, sf_dir):
    plan = explain(spark, sf_dir, "q_join_inner")
    assert "BroadcastHashJoin" in plan


def test_topk_uses_bounded_take_ordered(spark, sf_dir):
    plan = explain(spark, sf_dir, "q_topk")
    assert "TakeOrderedAndProject" in plan


def test_semi_anti_join_operators(spark, sf_dir):
    assert "LeftSemi" in explain(spark, sf_dir, "q_join_semi")
    assert "LeftAnti" in explain(spark, sf_dir, "q_join_anti")


def test_udf_is_arrow_vectorized(spark, sf_dir):
    plan = explain(spark, sf_dir, "q_udf")
    assert "ArrowEvalPython" in plan, "pandas UDF must run Arrow-vectorized"
    assert "BatchEvalPython" not in plan, "row-at-a-time Python UDF in hot path"


def test_approx_distinct_is_single_pass(spark, sf_dir):
    # HLL sketch with a tolerance contract: the qkey emits the exact
    # distinct count plus approx_ok = |HLL - exact| <= 5% (driver
    # hash-checks approx_ok=TRUE against the SQL oracle).
    df = QUERIES["q_agg_approx_distinct"](spark, sf_dir)
    exact = {
        r.l_returnflag: r.n_parts
        for r in QUERIES["q_agg_distinct"](spark, sf_dir).collect()
    }
    for row in df.collect():
        assert row.n_parts_exact == exact[row.l_returnflag]
        assert row.approx_ok, f"HLL estimate off >5% for {row.l_returnflag}"


def test_simhash_pairs_no_nested_loop_join(spark, sf_dir):
    """Candidate generation must be keyed equi-joins on the 16-bit
    halves — an OR-of-equalities condition would regress to
    BroadcastNestedLoopJoin (O(n^2), fatal at corpus scale)."""
    plan = explain(spark, sf_dir, "q_dedup_simhash_pairs")
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan
    # two half-joins (broadcast-hash at tiny SF, sort-merge at scale)
    n_joins = plan.count("BroadcastHashJoin") + plan.count("SortMergeJoin") + plan.count(
        "ShuffledHashJoin"
    )
    assert n_joins >= 2, plan


def test_dedup_resolve_joins_are_keyed(spark, sf_dir):
    """Label propagation must be equi-joins + keyed aggregation only."""
    plan = explain(spark, sf_dir, "q_dedup_resolve")
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan


@pytest.mark.parametrize("name", ["q_join_asof"])
def test_asof_single_shuffle(spark, sf_dir, name):
    # The as-of recipe must be one window pass — no nested-loop join.
    plan = explain(spark, sf_dir, name)
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan
    assert plan.count("Window") >= 1


def test_partitioned_layout_prunes_day_filter(spark, sf_dir, tmp_path):
    """The Phase-5 layout claim (SCALE.md §2) as a test: a day filter
    over the partitioned `events` copy must appear as a
    PartitionFilter on the scan (directory-level pruning), not a
    post-scan Filter. At 100 TB this is the difference between reading
    one day and reading the table. bench.py asserts the same gate at
    sf0.1 before timing q_part_prune."""
    import bench

    part_path = bench._setup_partitioned_events(spark, sf_dir, str(tmp_path))
    q = bench._partition_prune_query(spark, part_path)
    plan = spark._jvm.PythonSQLUtils.explainString(
        q._jdf.queryExecution(), "formatted"
    )
    assert "PartitionFilters" in plan
    pf = plan.split("PartitionFilters", 1)[1].split("]", 1)[0]
    assert "event_date" in pf
    # and the result is the one-day aggregate, computed correctly
    total = sum(r["n"] for r in q.collect())
    from pyspark.sql import functions as F

    from pipeline_airflow_docker_spark.catalog import table

    expected = (
        table(spark, sf_dir, "events")
        .where(F.to_date("ts") == F.lit("2024-01-15").cast("date"))
        .count()
    )
    assert total == expected and total > 0


def test_bucketed_join_has_no_exchange(spark, sf_dir, tmp_path):
    """Co-located join claim as a test: lineitem and orders bucketed by
    orderkey into the same bucket count must sort-merge join with ZERO
    Exchange operators (broadcast disabled — at 100 TB neither fact
    side broadcasts). bench.py asserts the same gate at sf0.1."""
    import bench

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        bench._setup_bucketed_tables(spark, sf_dir, str(tmp_path))
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        q = bench._bucket_join_query(spark)
        plan = spark._jvm.PythonSQLUtils.explainString(
            q._jdf.queryExecution(), "formatted"
        )
        # The final groupBy (not on the bucket key) legitimately
        # shuffles its few aggregate rows; the JOIN inputs must come
        # straight off the bucketed scans with no Exchange below the
        # SortMergeJoin in the plan tree.
        tree = plan.split("\n\n")[0]
        assert "SortMergeJoin" in tree, plan
        assert "Exchange" not in tree.split("SortMergeJoin", 1)[1], plan
        # and the join result is right (vs the unbucketed plan)
        from pyspark.sql import functions as F

        from pipeline_airflow_docker_spark.catalog import table

        li, o = table(spark, sf_dir, "lineitem"), table(spark, sf_dir, "orders")
        want = {
            (r.o_orderpriority, r.n_items)
            for r in li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n_items"))
            .collect()
        }
        got = {(r.o_orderpriority, r.n_items) for r in q.collect()}
        assert got == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        for t in ("bench_lineitem_b", "bench_orders_b"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_win_distribution_single_shuffle(spark):
    """All three distribution functions share one window spec — the
    plan must contain exactly one exchange (on c_nationkey)."""
    from pipeline_airflow_docker_spark.plans.relational import q_win_distribution

    plan = (
        q_win_distribution(spark, "/root/testdata/sf0.001")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1


def test_gapfill_materializes_missing_hours(spark):
    """Hours with no events appear with n_events=0 and carry the last
    observed total forward."""
    import datetime as dt

    from pipeline_airflow_docker_spark.plans.relational import q_gapfill
    import tempfile, os

    rows = [
        (1, dt.datetime(2024, 1, 1, 0, 30), 7, "click", 10.0, "{}"),
        (2, dt.datetime(2024, 1, 1, 3, 10), 7, "click", 5.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(os.path.join(d, "events.parquet"))
        out = {r.bucket.hour: r for r in q_gapfill(spark, d).collect()}
    assert sorted(out) == [0, 1, 2, 3]
    assert out[1].n_events == 0 and out[2].n_events == 0
    assert out[1].total == 0.0
    assert out[1].ffill_total == 10.0 and out[2].ffill_total == 10.0
    assert out[3].ffill_total == 5.0


# ---- round-3 plan gates ---------------------------------------------

# Every blocked candidate-generation path must stay an equi-join: a
# BroadcastNestedLoopJoin or CartesianProduct here is O(n^2) and fatal
# at corpus scale. q_join_range_binned regressed to an analysis error
# in round 2 — this pins its plan shape now that it runs again.
#
# Per-key budget of tolerable BroadcastNestedLoopJoins: ONLY the
# guaranteed-1-row quantizer attach (operators/similarity.py::
# _with_vector_set, a groupless collect_list aggregate crossJoined in,
# fan-out 1) may nested-loop. q_knn_ivf attaches the anchor set twice
# (corpus cell-assign + query probe ranking) = exactly 2 in the
# operator tree; everything else stays at 0, so any regression of a
# candidate join to a genuine O(n^2) BNLJ still fails.
_BNLJ_BUDGET = {"q_knn_ivf": 2}


@pytest.mark.parametrize(
    "name",
    [
        # (q_dedup_embedding and q_dedup_ngram are deliberately the
        # exact quadratic baselines and stay out of this gate; their
        # blocked counterparts are q_semdedup / q_dedup_minhash.)
        "q_join_range_binned",
        "q_dedup_minhash",
        "q_knn_lsh",
        "q_knn_ivf",
        "q_decontaminate",
        "q_semdedup",
        "q_dedup_incremental",
    ],
)
def test_blocked_joins_never_nested_loop(spark, sf_dir, name):
    plan = explain(spark, sf_dir, name)
    assert "CartesianProduct" not in plan, f"{name}: cartesian product"
    tree = plan.split("\n\n")[0]  # operator tree (details repeat names)
    n_bnlj = tree.count("BroadcastNestedLoopJoin")
    budget = _BNLJ_BUDGET.get(name, 0)
    assert n_bnlj <= budget, f"{name}: {n_bnlj} BNLJ (budget {budget})\n{plan}"
    if n_bnlj:
        # The allowed ones must be the 1-row collect_list attach.
        assert "collect_list" in plan, f"{name}: BNLJ without 1-row attach\n{plan}"


# Map-side-only operators must not shuffle at all: their plans should
# contain zero Exchange operators — at 100 TB these run as a single
# scan->project->write pipeline per input split.
@pytest.mark.parametrize(
    "name",
    [
        "q_chunk_docs",
        "q_redact_pii",
        "q_embed_quantize",
        "q_fn_math",
        "q_split_hash",
        "q_mix_corpora",
        "q_split_grouped",
        # char-class profile and type-token ratio are pure projections
        "q_charclass",
        "q_lexical_diversity",
    ],
)
def test_mapside_ops_have_zero_exchange(spark, sf_dir, name):
    plan = explain(spark, sf_dir, name)
    assert "Exchange" not in plan, f"{name}: unexpected shuffle"


# One keyed shuffle and nothing more: the window-based operators whose
# whole cost model is "a single Exchange on the partition key".
@pytest.mark.parametrize(
    "name",
    [
        "q_export_shards",
        "q_scd2",
        "q_sessionize",
        # histogram: map-side bin assign, one shuffle of <= n_bins
        # partial counts; shuffle_order: one shard-partitioned window.
        "q_histogram",
        "q_shuffle_order",
    ],
)
def test_single_shuffle_window_ops(spark, sf_dir, name):
    plan = explain(spark, sf_dir, name)
    tree = plan.split("\n\n")[0]
    assert tree.count("Exchange") == 1, f"{name}: expected exactly 1 Exchange\n{plan}"


def test_fuzzy_join_broadcasts_dimension(spark, sf_dir):
    # The levenshtein candidate join is bounded by broadcasting the
    # small dimension side; a shuffle join here would move the corpus.
    plan = explain(spark, sf_dir, "q_fuzzy_join")
    assert "BroadcastExchange" in plan


def test_train_export_no_duplicate_subtree(spark, sf_dir):
    """The capstone's quality stage must be an inline projection over
    the cleaned text — re-joining quality output to the text planned
    the segment-removal subtree twice (9 exchanges; now 4). Gate with
    headroom for AQE variation."""
    plan = explain(spark, sf_dir, "q_train_export")
    tree = plan.split("\n\n")[0]
    assert tree.count("Exchange") <= 5, plan


def test_orc_scan_pushes_filter_and_prunes_columns(spark, sf_dir):
    """The ORC reader must behave like the parquet one at 100 TB: the
    s_nationkey predicate reaches the scan as a pushed filter and the
    ReadSchema carries only the 3 projected columns (s_acctbal was
    written but not read)."""
    plan = explain(spark, sf_dir, "q_orc_roundtrip")
    scan = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert scan and "s_nationkey" in scan[0], plan
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert read_schema and "s_acctbal" not in read_schema[0], plan


def test_spearman_rank_windows_are_bin_parallel(spark, sf_dir):
    """B40: a flag-only rank window has parallelism = number of groups
    (3 tasks sorting the whole fact table; measured 97 s vs 33 s at
    sf10). The domain-bounded qty axis must carry NO fact ranking
    window at all (scaled_rank_by_value count-table lookup); the
    continuous price axis keeps exactly one rank window, and it must
    partition by (flag, BIN). The tiny offset/lookup prefix-sums on
    count tables are the only flag-only windows allowed."""
    import re

    plan = explain(spark, sf_dir, "q_corr_spearman")
    specs = re.findall(r"rank\([^)]*\) windowspecdefinition\(([^)]*)\)", plan)
    assert len(specs) == 1, plan  # price axis only — qty axis ranks by lookup
    assert "__bin" in specs[0], plan
    tree = plan.split("\n\n")[0]
    assert "CartesianProduct" not in tree, plan
    # offsets attach by broadcast — the fact table never joins by shuffle
    assert "SortMergeJoin" not in tree, plan


def test_mad_reads_medians_off_count_tables(spark, sf_dir):
    """B41: l_quantity (and therefore |l_quantity - med|) is domain-
    bounded, so both medians come from (flag, distinct-value) count
    tables (kth_value_by_counts) — NO ranking window over fact rows
    at all (round-4 lineage: flag-only windows sorted the whole table
    on #groups tasks, 46 s at sf10; binned selection ranked one bin,
    16 s; counting leaves the fact side two partial aggregates). The
    3-row med result must stay materialized so its subtree isn't
    re-planned into every consumer, and the fact table never joins by
    shuffle."""
    plan = explain(spark, sf_dir, "q_agg_mad")
    assert "row_number" not in plan, plan
    assert "rank(" not in plan, plan
    tree = plan.split("\n\n")[0]
    assert tree.count("Scan parquet") <= 2, plan
    assert "SortMergeJoin" not in tree, plan


def test_mix_temperature_fact_side_never_shuffles(spark, sf_dir):
    """C25: the corpus reaches the keep-filter through a broadcast
    join only; exchanges are confined to the tiny counts side (grouped
    count -> single-partition min window -> broadcast). Exactly two
    scans: fact + counts — a third means the counts subtree got
    planned twice."""
    plan = explain(spark, sf_dir, "q_mix_temperature")
    tree = plan.split("\n\n")[0]
    assert tree.count("Scan parquet") == 2, plan
    assert "BroadcastHashJoin" in tree, plan
    assert tree.count("Exchange") <= 3, plan


def test_intervals_merge_single_exchange(spark, sf_dir):
    """B42: the gaps-and-islands windows AND the (user, island)
    aggregate all cluster on user_id — one exchange end-to-end; a
    second one means the group-by stopped reusing the window
    partitioning."""
    plan = explain(spark, sf_dir, "q_intervals_merge")
    tree = plan.split("\n\n")[0]
    assert tree.count("Scan parquet") == 1, plan
    assert tree.count("Exchange") == 1, plan


def test_quantile_bucket_is_bin_parallel(spark, sf_dir):
    """B45: the positional tiers come from binned row_numbers — every
    row_number windowspec must include the bin column (a flag-only
    ntile window sorts all events on 5 tasks: 9.8 s vs 3.8 s at
    sf10), and the fact table reaches its offsets by broadcast, never
    a shuffle join."""
    import re

    plan = explain(spark, sf_dir, "q_quantile_bucket")
    specs = re.findall(r"row_number\(\) windowspecdefinition\(([^)]*)\)", plan)
    assert specs and all("__bin" in s for s in specs), plan
    tree = plan.split("\n\n")[0]
    assert "SortMergeJoin" not in tree, plan
    assert "ntile" not in plan, plan  # no group-partitioned ntile remains


def test_registry_wide_no_cartesian_no_row_python(spark, sf_dir):
    """Whole-registry invariant: ZERO CartesianProduct and ZERO
    row-at-a-time Python UDFs (BatchEvalPython) across every batch
    qkey's physical plan — the two operators that silently turn a
    100 TB plan into a non-plan. Vectorized Python (ArrowEvalPython /
    mapInPandas / UDTF) is the sanctioned boundary and stays allowed.
    Streaming keys are excluded (their construction executes the run;
    shapes asserted in test_streaming.py)."""
    import sys as _sys

    sys_path_root = __import__("os").path.dirname(__import__("os").path.dirname(__file__))
    if sys_path_root not in _sys.path:
        _sys.path.insert(0, sys_path_root)
    from tools.plan_audit import audit_rows

    rows = audit_rows(spark, sf_dir)
    offenders = [r for r in rows if r["cartesian"] or r["row_py"]]
    assert not offenders, offenders
    # Global ORDERED windows (partition-less sort through one task) are
    # allowed ONLY over bounded-by-construction internal tables. The
    # whole-registry allowed set (round 11, after q_row_number moved to
    # the range-sharded splits.global_row_index): q_ks_drift's single
    # cumulative-distribution window over its <= n_bins bin-totals
    # aggregate. Growing this set requires the same boundedness
    # argument in the operator's docstring.
    gwin = sorted(r["qkey"] for r in rows if r["global_win"])
    assert gwin == ["q_ks_drift"], gwin
