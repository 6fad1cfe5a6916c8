"""Round-17 optimization experiment variants for tools/opt_ab.py.

Each fn(spark, sf_dir) -> DataFrame is a CANDIDATE restructuring of a
registry query. Nothing here is wired into the registry — candidates
that measure faster AND pass tools/check_parity.py get promoted into
the real query; the rest are recorded in OPTIMIZATION_r17.md and
dropped.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pipeline_airflow_docker_spark.catalog import table
from pipeline_airflow_docker_spark.functions.numeric import davg, dec, dsum


def _spread_rr(df: DataFrame, factor: int = 3) -> DataFrame:
    target = factor * df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def _spread_hash(df: DataFrame, key: str, factor: int = 3) -> DataFrame:
    target = factor * df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target, F.col(key))
    return df


def _agg_group_body(li: DataFrame) -> DataFrame:
    disc_price = dec("l_extendedprice") * (
        F.lit(1) - dec("l_discount")
    ).cast("decimal(8,4)")
    charge = disc_price * (F.lit(1) + dec("l_tax")).cast("decimal(8,4)")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def _li_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    return table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
    )


def agg_group_spread_rr(spark, sf_dir):
    cols = [
        "l_returnflag", "l_linestatus", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax",
    ]
    return _agg_group_body(_spread_rr(_li_filtered(spark, sf_dir).select(*cols)))


def agg_group_spread_hash(spark, sf_dir):
    cols = [
        "l_orderkey", "l_returnflag", "l_linestatus", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax",
    ]
    return _agg_group_body(
        _spread_hash(_li_filtered(spark, sf_dir).select(*cols), "l_orderkey")
    ).drop("l_orderkey")


def agg_group_spread_rr1(spark, sf_dir):
    cols = [
        "l_returnflag", "l_linestatus", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax",
    ]
    return _agg_group_body(_spread_rr(_li_filtered(spark, sf_dir).select(*cols), factor=1))


def rollup_spread_rr(spark, sf_dir):
    li = _spread_rr(
        table(spark, sf_dir, "lineitem").select(
            "l_returnflag", "l_linestatus", "l_quantity"
        )
    )
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().alias("gid"),
            dsum("l_quantity").alias("sum_qty"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .orderBy("gid", "l_returnflag", "l_linestatus")
        .select("l_returnflag", "l_linestatus", "gid", "sum_qty", "n_rows")
    )


def distinct_spread_rr(spark, sf_dir):
    li = _spread_rr(
        table(spark, sf_dir, "lineitem").select(
            "l_returnflag", "l_partkey", "l_suppkey"
        )
    )
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("n_parts"),
            F.countDistinct("l_suppkey").alias("n_supps"),
        )
        .orderBy("l_returnflag")
    )


def spearman_materialized(spark, sf_dir):
    from pipeline_airflow_docker_spark.functions.materialize import materialize
    from pipeline_airflow_docker_spark.operators.ranks import (
        binned_scaled_ranks,
        scaled_rank_by_value,
    )

    li = (
        table(spark, sf_dir, "lineitem")
        .select("l_returnflag", "l_quantity", "l_extendedprice")
        .filter(
            F.col("l_quantity").isNotNull()
            & F.col("l_extendedprice").isNotNull()
        )
    )
    li = materialize(_spread_rr(li))
    ranked = scaled_rank_by_value(li, "l_returnflag", "l_quantity", out_col="rx")
    ranked = binned_scaled_ranks(
        ranked, "l_returnflag", [("l_extendedprice", 2048.0, "ry")]
    ).select("l_returnflag", "rx", "ry")
    m = ranked.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("rx").cast("double").alias("sx"),
        F.sum("ry").cast("double").alias("sy"),
        F.sum(F.col("rx") * F.col("rx")).cast("double").alias("sxx"),
        F.sum(F.col("ry") * F.col("ry")).cast("double").alias("syy"),
        F.sum(F.col("rx") * F.col("ry")).cast("double").alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    return m.select(
        "l_returnflag",
        "n",
        (
            (sxy - sx * sy / n)
            / (F.sqrt(sxx - sx * sx / n) * F.sqrt(syy - sy * sy / n))
        ).alias("rho_qty_price"),
    ).orderBy("l_returnflag")


def spearman_spread_only(spark, sf_dir):
    from pipeline_airflow_docker_spark.operators.ranks import (
        binned_scaled_ranks,
        scaled_rank_by_value,
    )

    li = _spread_rr(
        table(spark, sf_dir, "lineitem")
        .select("l_returnflag", "l_quantity", "l_extendedprice")
        .filter(
            F.col("l_quantity").isNotNull()
            & F.col("l_extendedprice").isNotNull()
        )
    )
    ranked = scaled_rank_by_value(li, "l_returnflag", "l_quantity", out_col="rx")
    ranked = binned_scaled_ranks(
        ranked, "l_returnflag", [("l_extendedprice", 2048.0, "ry")]
    ).select("l_returnflag", "rx", "ry")
    m = ranked.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("rx").cast("double").alias("sx"),
        F.sum("ry").cast("double").alias("sy"),
        F.sum(F.col("rx") * F.col("rx")).cast("double").alias("sxx"),
        F.sum(F.col("ry") * F.col("ry")).cast("double").alias("syy"),
        F.sum(F.col("rx") * F.col("ry")).cast("double").alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    return m.select(
        "l_returnflag",
        "n",
        (
            (sxy - sx * sy / n)
            / (F.sqrt(sxx - sx * sx / n) * F.sqrt(syy - sy * sy / n))
        ).alias("rho_qty_price"),
    ).orderBy("l_returnflag")


def rollup_spread_hash(spark, sf_dir):
    li = _spread_hash(
        table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_returnflag", "l_linestatus", "l_quantity"
        ),
        "l_orderkey",
    ).drop("l_orderkey")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().alias("gid"),
            dsum("l_quantity").alias("sum_qty"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .orderBy("gid", "l_returnflag", "l_linestatus")
        .select("l_returnflag", "l_linestatus", "gid", "sum_qty", "n_rows")
    )


def distinct_spread_hash(spark, sf_dir):
    li = _spread_hash(
        table(spark, sf_dir, "lineitem").select(
            "l_returnflag", "l_partkey", "l_suppkey"
        ),
        "l_partkey",
    )
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("n_parts"),
            F.countDistinct("l_suppkey").alias("n_supps"),
        )
        .orderBy("l_returnflag")
    )


def _spearman_final(ranked):
    m = ranked.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("rx").cast("double").alias("sx"),
        F.sum("ry").cast("double").alias("sy"),
        F.sum(F.col("rx") * F.col("rx")).cast("double").alias("sxx"),
        F.sum(F.col("ry") * F.col("ry")).cast("double").alias("syy"),
        F.sum(F.col("rx") * F.col("ry")).cast("double").alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    return m.select(
        "l_returnflag",
        "n",
        (
            (sxy - sx * sy / n)
            / (F.sqrt(sxx - sx * sx / n) * F.sqrt(syy - sy * sy / n))
        ).alias("rho_qty_price"),
    ).orderBy("l_returnflag")


def _spearman_v3_ranked(spark, sf_dir, spread=False):
    """Both axes' count tables derive from the RAW scan, so no count
    subtree replans the other axis's join; fact lineage is touched
    once. Rank arithmetic identical to operators/ranks.py."""
    from pipeline_airflow_docker_spark.operators.ranks import join_group_nullsafe

    li = (
        table(spark, sf_dir, "lineitem")
        .select("l_returnflag", "l_quantity", "l_extendedprice")
        .filter(
            F.col("l_quantity").isNotNull()
            & F.col("l_extendedprice").isNotNull()
        )
    )
    # rx lut from raw li (scaled_rank_by_value arithmetic)
    vc = li.groupBy("l_returnflag", "l_quantity").agg(F.count(F.lit(1)).alias("__n"))
    w_before = (
        Window.partitionBy("l_returnflag")
        .orderBy("l_quantity")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    lut = vc.select(
        "l_returnflag",
        "l_quantity",
        (
            2 * F.coalesce(F.sum("__n").over(w_before), F.lit(0))
            + F.col("__n")
            + F.lit(1)
        ).cast("decimal(18,0)").alias("rx"),
    )
    # ry offsets from raw li (binned_scaled_ranks arithmetic)
    bin_col = F.floor(F.col("l_extendedprice") / F.lit(2048.0))
    binned = li.withColumn("__bin", bin_col)
    counts = binned.groupBy("l_returnflag", "__bin").agg(
        F.count(F.lit(1)).alias("__n")
    )
    w_off = (
        Window.partitionBy("l_returnflag")
        .orderBy("__bin")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.select(
        "l_returnflag",
        "__bin",
        F.coalesce(F.sum("__n").over(w_off), F.lit(0)).alias("__offset"),
    )
    fact = binned
    if spread:
        fact = _spread_hash(fact, "l_extendedprice")
    w_bin = Window.partitionBy("l_returnflag", "__bin").orderBy("l_extendedprice")
    w_ties = w_bin.rangeBetween(Window.currentRow, Window.currentRow)
    local = 2 * (F.col("__offset") + F.rank().over(w_bin)) + F.count(
        F.lit(1)
    ).over(w_ties) - F.lit(1)
    out = (
        join_group_nullsafe(fact, offsets, ["l_returnflag", "__bin"])
        .withColumn("ry", local.cast("decimal(18,0)"))
        .drop("__offset")
    )
    out = join_group_nullsafe(out, lut, ["l_returnflag", "l_quantity"])
    return out.select("l_returnflag", "rx", "ry")


def spearman_v3(spark, sf_dir):
    return _spearman_final(_spearman_v3_ranked(spark, sf_dir, spread=False))


def spearman_v3_spread(spark, sf_dir):
    return _spearman_final(_spearman_v3_ranked(spark, sf_dir, spread=True))


def join_inner_preagg(spark, sf_dir):
    """Aggregate lineitem by l_orderkey BEFORE the fact join (guide
    §2.3 aggregate-before-shuffle): the orderkey partial collapses ~4
    lines/order map-side, so the SMJ shuffle moves per-order partials,
    not per-line rows. Decimal partial sums are exact => identical
    revenue."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    n = table(spark, sf_dir, "nation")
    revenue = dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))
    li_agg = (
        li.groupBy("l_orderkey")
        .agg(
            F.sum(revenue).alias("rev_partial"),
            F.count(F.lit(1)).alias("n_lines_partial"),
        )
    )
    co = (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .select("o_orderkey", "n_name")
    )
    return (
        li_agg.hint("merge")
        .join(co, li_agg.l_orderkey == co.o_orderkey)
        .groupBy("n_name")
        .agg(
            F.sum("rev_partial").cast("double").alias("revenue"),
            F.sum("n_lines_partial").alias("n_lines"),
        )
        .orderBy(F.col("revenue").desc(), "n_name")
    )


def setops_flags(spark, sf_dir):
    """intersect/except over distinct key sets as ONE null-safe
    full-outer join of the two distinct aggregates + presence flags —
    2 scans instead of 4, no replanned distinct subtrees."""
    cust = (
        table(spark, sf_dir, "customer")
        .select(F.col("c_nationkey").alias("nationkey")).distinct()
        .withColumn("__c", F.lit(1))
    )
    supp = (
        table(spark, sf_dir, "supplier")
        .select(F.col("s_nationkey").alias("nationkey")).distinct()
        .withColumn("__s", F.lit(1))
    )
    j = cust.join(
        supp, cust["nationkey"].eqNullSafe(supp["nationkey"]), "full_outer"
    ).select(
        F.coalesce(cust["nationkey"], supp["nationkey"]).alias("nationkey"),
        cust["__c"].alias("__c"),
        supp["__s"].alias("__s"),
    )
    tag = (
        F.when(F.col("__c").isNotNull() & F.col("__s").isNotNull(), F.lit("both"))
        .when(F.col("__c").isNotNull(), F.lit("customer_only"))
    )
    return (
        j.withColumn("tag", tag)
        .filter(F.col("tag").isNotNull())
        .select("tag", "nationkey")
    )


def udf_spread(spark, sf_dir):
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _score(n_chars, doc_id):
        return (n_chars * 31 + doc_id * 7) % 97

    _score.__annotations__ = {
        "n_chars": pd.Series, "doc_id": pd.Series, "return": pd.Series
    }
    score = pandas_udf(_score, "long")
    d = _spread_hash(
        table(spark, sf_dir, "documents").select("doc_id", "n_chars"), "doc_id"
    )
    return d.select("doc_id", score("n_chars", "doc_id").alias("score"))


def asof_single_scan(spark, sf_dir):
    """Union of two filtered scans -> ONE scan with a CASE projection:
    each (click|view) row maps to exactly one merged row, so the
    union's second pass over events is pure waste."""
    ev = table(spark, sf_dir, "events")
    is_click = F.col("event_type") == "click"
    merged = ev.filter(is_click | (F.col("event_type") == "view")).select(
        F.when(is_click, F.col("event_id")).alias("event_id"),
        "user_id",
        "ts",
        F.when(~is_click, F.col("ts")).alias("view_ts"),
        F.when(is_click, F.lit(1)).otherwise(F.lit(0)).alias("__kind"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "__kind", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = merged.withColumn(
        "last_view_ts", F.last("view_ts", ignorenulls=True).over(w)
    )
    return merged.filter(F.col("__kind") == 1).select(
        "event_id", "user_id", "ts", "last_view_ts"
    )


def moments_spread_hash(spark, sf_dir):
    li = _spread_hash(
        table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_returnflag", "l_quantity", "l_extendedprice"
        ),
        "l_orderkey",
    )
    dq = dec("l_quantity", 18, 4)
    dp = dec("l_extendedprice", 18, 4)
    m = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dq).cast("double").alias("sx"),
        F.sum(dp).cast("double").alias("sy"),
        F.sum(dq * dq).cast("double").alias("sxx"),
        F.sum(dp * dp).cast("double").alias("syy"),
        F.sum(dq * dp).cast("double").alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    return m.select(
        "l_returnflag",
        "n",
        F.sqrt((sxx - sx * sx / n) / (n - 1)).alias("std_qty"),
        (
            (sxy - sx * sy / n)
            / (F.sqrt(sxx - sx * sx / n) * F.sqrt(syy - sy * sy / n))
        ).alias("corr_qty_price"),
    ).orderBy("l_returnflag")


def join_outer_preagg(spark, sf_dir):
    """Count orders per custkey BEFORE the join: the left join then
    attaches one pre-counted row per customer instead of fanning out
    order rows. count(o_orderkey) skips NULL orderkeys exactly like
    the fanned-out count."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    per_cust_orders = o.groupBy("o_custkey").agg(
        F.count("o_orderkey").alias("__cnt")
    )
    per_cust = (
        c.join(per_cust_orders, c.c_custkey == per_cust_orders.o_custkey, "left")
        .select(
            "c_custkey",
            F.coalesce(F.col("__cnt"), F.lit(0)).alias("c_count"),
        )
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


def join_outer_preagg2(spark, sf_dir):
    """Correct under duplicate/NULL c_custkey: re-group by c_custkey
    after the attach, summing the pre-counted orders per customer ROW
    (duplicate custkeys merge exactly like the fanned-out groupBy)."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    per_cust_orders = o.groupBy("o_custkey").agg(
        F.count("o_orderkey").alias("__cnt")
    )
    per_cust = (
        c.join(per_cust_orders, c.c_custkey == per_cust_orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.sum(F.coalesce(F.col("__cnt"), F.lit(0))).alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


def minhash_lazy_ckpt(spark, sf_dir):
    """q_dedup_minhash with a LAZY localCheckpoint of the shingle
    table: the eager form runs a dedicated materialization job before
    any consumer; lazy materializes during the first consumer job
    (the band aggregate computes every partition), saving one full
    scheduling round."""
    from pipeline_airflow_docker_spark.operators import dedup as dd
    from pyspark.sql import functions as FF

    orig = dd.materialize
    def lazy_mat(df, how=None, truncate=False):
        return df.localCheckpoint(eager=False)
    dd.materialize = lazy_mat
    try:
        d = table(spark, sf_dir, "documents")
        return dd.minhash_dup_pairs(d, "doc_id", "text", n=3, n_hashes=8, n_bands=4, threshold=0.8)
    finally:
        dd.materialize = orig


def bloom_join_spread(spark, sf_dir):
    from pipeline_airflow_docker_spark.operators.bloomjoin import bloom_semi_join
    from pipeline_airflow_docker_spark.operators.skew import spread

    li = spread(
        table(spark, sf_dir, "lineitem").select(
            "l_suppkey", "l_returnflag", "l_extendedprice"
        ),
        key="l_suppkey",
    )
    dim = (
        table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 5000)
        .select("s_suppkey")
    )
    semi = bloom_semi_join(li, "l_suppkey", dim, "s_suppkey")
    return (
        semi.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            dsum("l_extendedprice").alias("sum_price"),
        )
        .orderBy("l_returnflag")
    )
