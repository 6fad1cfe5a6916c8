"""Round-18 optimization variants for tools/opt_ab.py.

Each function is a candidate builder fn(spark, sf_dir) -> DataFrame,
A/B'd against the registry baseline in the same process:

    python tools/opt_ab.py q_profile tools.opt_variants_r18:profile_noexpand

Adopted variants are ported into the operator modules; rejected ones
stay here with their numbers in OPTIMIZATION_r18.md so the next round
doesn't re-try them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pipeline_airflow_docker_spark.catalog import table
from pipeline_airflow_docker_spark.operators.skew import spread

_PROFILE_COLS = ["l_orderkey", "l_quantity", "l_returnflag", "l_linestatus"]

_NUMERIC_TYPES = (
    T.ByteType,
    T.ShortType,
    T.IntegerType,
    T.LongType,
    T.FloatType,
    T.DoubleType,
    T.DecimalType,
)


def _profile_noexpand(df: DataFrame, cols: list[str], spread_key) -> DataFrame:
    """Exact column profile without the multi-countDistinct Expand.

    Catalyst plans N countDistinct aggregates as Expand ×(N+1) feeding
    THREE SortAggregate layers with a Sort of the expanded rows — at
    sf0.1 that sort of 3M wide rows dominates q_profile (slowest
    registry key, ~2.9 s). Same statistics from one scan instead:

      explode one (idx, value) struct per profiled column per row
      -> groupBy(idx, value) with count  [HashAggregate, no sort]
      -> groupBy(idx): n_rows = sum(c), n_nonnull = sum(c | nonnull),
         n_distinct = count(groups | nonnull), min/max over group keys
      -> left-join a literal idx spine (keeps n_cols output rows on
         empty input) and shape per-column output rows.

    Distinct-count semantics match countDistinct exactly: grouping
    normalizes NaN / -0.0 on float keys the same way countDistinct
    does; raw float payload copies keep min/max over the raw values.
    """
    by_name = {f.name: f.dataType for f in df.schema.fields}
    # one struct field per distinct dtype among cols
    field_of: dict[str, str] = {}
    dtypes: list[tuple[str, object]] = []
    for c in cols:
        key = by_name[c].simpleString()
        if key not in field_of:
            field_of[key] = f"__v{len(dtypes)}"
            dtypes.append((key, by_name[c]))
    float_keys = {
        k for k, dt in dtypes if isinstance(dt, (T.FloatType, T.DoubleType))
    }

    entries = []
    for i, c in enumerate(cols):
        ckey = by_name[c].simpleString()
        fields = [F.lit(i).alias("__idx"), F.col(c).isNotNull().alias("__nn")]
        for key, dt in dtypes:
            val = F.col(c) if key == ckey else F.lit(None).cast(dt)
            fields.append(val.alias(field_of[key]))
            if key in float_keys:
                # raw payload: the GROUP KEY copy is NaN/-0.0-normalized
                # by the aggregate; min/max must see the raw values.
                fields.append(val.alias(f"{field_of[key]}__raw"))
        entries.append(F.struct(*fields))

    src = spread(df.select(*dict.fromkeys(cols)), key=spread_key)
    ex = src.select(F.explode(F.array(*entries)).alias("e")).select("e.*")

    key_cols = ["__idx", "__nn", *[field_of[k] for k, _ in dtypes]]
    g1_aggs = [F.count(F.lit(1)).alias("__c")]
    for k, _ in dtypes:
        f = field_of[k]
        if k in float_keys:
            g1_aggs.append(F.min(f"{f}__raw").alias(f"{f}__rmin"))
            g1_aggs.append(F.max(f"{f}__raw").alias(f"{f}__rmax"))
    g1 = ex.groupBy(*key_cols).agg(*g1_aggs)

    g2_aggs = [
        F.sum("__c").alias("__n_rows"),
        F.sum(F.when(F.col("__nn"), F.col("__c")).otherwise(F.lit(0))).alias(
            "__n_nonnull"
        ),
        F.sum(F.when(F.col("__nn"), F.lit(1)).otherwise(F.lit(0))).alias(
            "__n_distinct"
        ),
    ]
    for k, _ in dtypes:
        f = field_of[k]
        if k in float_keys:
            g2_aggs.append(F.min(f"{f}__rmin").alias(f"{f}__min"))
            g2_aggs.append(F.max(f"{f}__rmax").alias(f"{f}__max"))
        else:
            g2_aggs.append(F.min(f).alias(f"{f}__min"))
            g2_aggs.append(F.max(f).alias(f"{f}__max"))
    g2 = g1.groupBy("__idx").agg(*g2_aggs)

    spark = df.sparkSession
    spine = spark.range(len(cols)).select(
        F.col("id").cast("int").alias("__sidx"),
        F.array(*[F.lit(c) for c in cols])[F.col("id").cast("int")].alias(
            "column_name"
        ),
    )
    j = spine.join(g2, spine["__sidx"] == g2["__idx"], "left")

    def _case(builder) -> F.Column:
        out = None
        for i, c in enumerate(cols):
            expr = builder(i, c)
            if expr is None:
                continue
            cond = F.col("__sidx") == i
            out = F.when(cond, expr) if out is None else out.when(cond, expr)
        return out if out is not None else F.lit(None)

    def _minmax(which: str, numeric: bool):
        def b(i: int, c: str):
            is_num = isinstance(by_name[c], _NUMERIC_TYPES)
            if is_num != numeric:
                return None
            f = field_of[by_name[c].simpleString()]
            src_col = F.col(f"{f}__{which}")
            return src_col.cast("double") if numeric else src_col.cast("string")

        return b

    return j.select(
        "column_name",
        F.coalesce("__n_rows", F.lit(0)).alias("n_rows"),
        F.coalesce("__n_nonnull", F.lit(0)).alias("n_nonnull"),
        F.coalesce("__n_distinct", F.lit(0)).cast("long").alias("n_distinct"),
        _case(_minmax("min", True)).cast("double").alias("min_num"),
        _case(_minmax("max", True)).cast("double").alias("max_num"),
        _case(_minmax("min", False)).cast("string").alias("min_str"),
        _case(_minmax("max", False)).cast("string").alias("max_str"),
    )


def profile_noexpand(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return _profile_noexpand(li, _PROFILE_COLS, spread_key=_PROFILE_COLS)


def profile_noexpand_rr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-robin spread (ADVICE: hash-on-profiled-cols degenerates on
    low-joint-cardinality columns)."""
    li = table(spark, sf_dir, "lineitem")
    return _profile_noexpand(li, _PROFILE_COLS, spread_key=None)


# ------------------------------------------------------------------
# Spread-rule candidates (VERDICT item 5): heavy per-row pre-exchange
# compute is the documented win condition (operators/skew.py).
# ------------------------------------------------------------------


def histogram_spread(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pipeline_airflow_docker_spark.operators.profile import histogram_fixed

    li = table(spark, sf_dir, "lineitem")
    return histogram_fixed(
        spread(li.select("l_extendedprice"), key="l_extendedprice"),
        "l_extendedprice",
        lo=0.0,
        hi=110_000.0,
        n_bins=20,
    )


def table_diff_spread(spark: SparkSession, sf_dir: str) -> DataFrame:
    """md5-per-row is the heavy-per-row class; spread both sides."""
    from pipeline_airflow_docker_spark.operators.reconcile import table_diff

    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority"
    )
    o = spread(o, key="o_orderkey")
    old = o.filter(F.col("o_orderkey") % 101 != 0)
    new = o.filter(F.col("o_custkey") % 97 != 0).withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderkey") % 13 == 0, F.round(F.col("o_totalprice") + 1.0, 2)
        ).otherwise(F.col("o_totalprice")),
    )
    return table_diff(old, new, keys=["o_orderkey"])


def ngram_counts_spread(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Textstats keyed aggregate with spread before tokenize+explode
    (VERDICT item 5)."""
    from pipeline_airflow_docker_spark.operators.textstats import ngram_counts

    d = table(spark, sf_dir, "documents")
    return ngram_counts(spread(d.select("text"), key="text"), "text", n=2, top_k=100)


def word_entropy_spread(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pipeline_airflow_docker_spark.operators.textstats import word_entropy

    d = table(spark, sf_dir, "documents")
    return word_entropy(spread(d, key="doc_id"), "source")


def zipf_slope_spread(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pipeline_airflow_docker_spark.operators.textstats import zipf_slope

    d = table(spark, sf_dir, "documents")
    return zipf_slope(spread(d, key="doc_id"), "lang")


# dedup_minhash_hashspread / dedup_simhash_hashspread (VERDICT item
# 6): measured q_dedup_minhash 0.955 → 0.735 s and q_dedup_simhash
# 1.25 → 0.82 s (checksum-identical) — ADOPTED into operators/dedup.py
# (_spread(df, key=id_col) at the shingle/simhash call sites), so the
# registry baseline now IS the variant; the standalone builders were
# removed with the adoption.


def stream_bounded_onebatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VERDICT item 7 measurement: q_stream_bounded without the
    maxFilesPerTrigger=1 rate cap (single availableNow micro-batch over
    the same 2-file stage). Results are identical (the 100-earliest
    bound is batch-structure-independent); what changes is WHAT THE KEY
    DEMONSTRATES — rate-capped multi-micro-batch consumption, the
    reference's maxOffsetsPerTrigger analog. Measured to size the
    per-micro-batch floor, not necessarily to adopt."""
    from pipeline_airflow_docker_spark.streaming.runner import run_to_df
    from pipeline_airflow_docker_spark.streaming.sources import stream_table

    ev = stream_table(spark, sf_dir, "events", n_files=2)
    consumed = run_to_df(
        ev.select("event_id", "ts", "event_type"), output_mode="append"
    )
    return (
        consumed.orderBy("ts", "event_id")
        .limit(100)
        .select("event_id", F.upper("event_type").alias("event_type_u"))
    )


def dedup_resolve_foldcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REJECTED (VERDICT item 3): fold the convergence check into the
    propagation aggregate — tag the own-label row through the
    union/groupBy (min(__own)), then count rows whose min beat their
    own label on the materialized result. Measured 1.70 → 2.04 s
    checksum / 1.19 → 2.14 s noop at sf0.1 vs the join-count loop
    (checksum-identical): the count still needs its own job (eager
    localCheckpoint returns no aggregates), so no job is removed and
    the extra __own column inflates every round's union+shuffle; the
    join-count it replaces is exchange-free anyway (both sides
    materialized hashpartitioned on id). Kept for re-testing."""
    from pipeline_airflow_docker_spark.functions.materialize import (
        materialize,
        release,
    )
    from pipeline_airflow_docker_spark.operators.dedup import minhash_dup_pairs

    d = table(spark, sf_dir, "documents")
    pairs = minhash_dup_pairs(
        d, "doc_id", "text", n=3, n_hashes=8, n_bands=4, threshold=0.8
    ).select("id_a", "id_b")
    nodes = d.select("doc_id")
    edges = (
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .unionByName(
            pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst"))
        )
        .dropDuplicates(["src", "dst"])
    )
    edges = materialize(edges.repartition(F.col("src")), truncate=True)
    pinned = materialize(
        nodes.select(F.col("doc_id").alias("id"), F.col("doc_id").alias("component")),
        truncate=True,
    )
    labels = pinned
    for _ in range(50):
        pushed = edges.join(labels, edges["src"] == labels["id"]).select(
            F.col("dst").alias("id"),
            "component",
            F.lit(None).cast("long").alias("__own"),
        )
        own = labels.select("id", "component", F.col("component").alias("__own"))
        new_full = materialize(
            own.unionByName(pushed)
            .groupBy("id")
            .agg(
                F.min("component").alias("component"),
                F.min("__own").alias("__own"),
            ),
            truncate=True,
        )
        changed = new_full.filter(F.col("component") < F.col("__own")).count()
        release(pinned)
        pinned = new_full
        labels = new_full.select("id", "component")
        if changed == 0:
            break
    release(edges)
    return labels


def agg_salted_spread(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pipeline_airflow_docker_spark.functions.numeric import dec
    from pipeline_airflow_docker_spark.operators.skew import salted_agg

    ev = spread(table(spark, sf_dir, "events"), key="event_id")
    out = salted_agg(
        ev,
        keys=["event_type"],
        partial_aggs={"ps": F.sum(dec("value")), "pc": F.count(F.lit(1))},
        final_aggs={
            "total_value": F.sum("ps").cast("double"),
            "n_events": F.sum("pc"),
        },
        num_salts=16,
        salt_on=["event_id"],
    )
    return out.orderBy("event_type")
