"""Data-quality profiling and distribution-outlier operators.

The reference validates data by eyeballing record counts in task logs
(`etl_data_pipeline.py` count task, `kafka_to_mongo_pipeline_enchanced.py`
quality-check stage); a 100 TB pipeline needs machine-checkable column
profiles and automated outlier screens instead. Both operators here are
single-pass aggregates (map-side partials, one shuffle) so they cost one
scan regardless of table size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pipeline_airflow_docker_spark.functions.numeric import davg, dec

_NUMERIC_TYPES = (
    T.ByteType,
    T.ShortType,
    T.IntegerType,
    T.LongType,
    T.FloatType,
    T.DoubleType,
    T.DecimalType,
)


def profile_columns(
    df: DataFrame,
    cols: list[str],
    exact_distinct: bool = True,
    approx_rsd: float = 0.05,
) -> DataFrame:
    """Deequ-style column profile: one row per column with
    ``(column_name, n_rows, n_nonnull, n_distinct, min_num, max_num,
    min_str, max_str)``. One scan of the input on either path.

    ``exact_distinct=True`` (default): exact distinct counts WITHOUT
    the multi-countDistinct Expand (r18). Catalyst plans N
    countDistinct aggregates as Expand ×(N+1) feeding three
    SortAggregate layers with a Sort of the expanded rows — at sf0.1
    that sort dominated this operator (slowest registry key, ~2.9 s;
    plans/r18/q_profile_before.txt). Instead: explode one
    ``(idx, value)`` struct per profiled column per row, then two
    HashAggregates — ``groupBy(idx, value).count()`` (map-side partial
    collapses duplicates before the only full-width exchange), then
    per-idx ``n_rows = Σc``, ``n_nonnull = Σc over non-null groups``,
    ``n_distinct = #non-null groups``, min/max over group keys. The
    distinct semantics match countDistinct exactly — grouping
    normalizes NaN/-0.0 on float keys just like countDistinct does —
    and raw float payload copies keep min/max over the raw values. A
    literal idx spine keeps n_cols output rows on empty input.
    Measured 2.35 s → 1.50 s at sf0.1 (checksum-identical); shuffle
    volume class is unchanged (per-partition-distinct partials either
    way), the win is codegen hash aggregation replacing sorts. Scope
    note: the HEAVY stage — the per-(idx, value) distinct aggregate
    over the exploded rows — is always a HashAggregate; when a STRING
    column is profiled, the tiny per-idx finalization (min/max string
    buffers are not hash-aggregable) still plans one SortAggregate
    pair, but its sort input is the already-collapsed distinct table,
    not the ×n_cols exploded rows the old plan sorted.

    ``exact_distinct=False``: ``approx_count_distinct`` (HLL++,
    fixed-size sketch) in a single wide aggregate — exactly one
    map-side pass regardless of column count; only ``n_distinct`` is
    approximate (``approx_rsd`` = the sketch's maximum relative
    standard deviation, Spark default 0.05), every other statistic is
    exact on both paths.
    """
    by_name = {f.name: f.dataType for f in df.schema.fields}
    missing = [c for c in cols if c not in by_name]
    if missing:
        raise ValueError(f"profile_columns: unknown columns {missing!r}")

    # Scale-adaptive spread before the per-row work (r17): no-op once
    # the scan has ≥3×cores splits; hash on the profiled columns
    # (beats round-robin 1.50 vs 1.72 s — skips the SPARK-23207 sort).
    # Known trade (r18 ADVICE): a LOW joint-cardinality profile set
    # (all flags/enums) concentrates the spread onto ≤ n-distinct
    # tasks — but the same low cardinality collapses the map-side
    # partial aggregate, bounding the per-task work the spread exists
    # to parallelize; the high-cardinality case is the expensive one
    # and hash handles it best.
    from pipeline_airflow_docker_spark.operators.skew import spread  # noqa: PLC0415

    src = spread(df.select(*dict.fromkeys(cols)), key=cols)

    if exact_distinct:
        return _profile_exact(df, src, cols, by_name)

    aggs: list[Column] = [F.count(F.lit(1)).alias("__n_rows")]
    for c in cols:
        aggs.append(F.count(c).alias(f"__nn_{c}"))
        aggs.append(F.approx_count_distinct(c, rsd=approx_rsd).alias(f"__nd_{c}"))
        aggs.append(F.min(c).alias(f"__min_{c}"))
        aggs.append(F.max(c).alias(f"__max_{c}"))
    wide = src.agg(*aggs)

    def _entry(c: str) -> Column:
        numeric = isinstance(by_name[c], _NUMERIC_TYPES)
        if numeric:
            min_num = F.col(f"__min_{c}").cast("double")
            max_num = F.col(f"__max_{c}").cast("double")
            min_str = F.lit(None).cast("string")
            max_str = F.lit(None).cast("string")
        else:
            min_num = F.lit(None).cast("double")
            max_num = F.lit(None).cast("double")
            min_str = F.col(f"__min_{c}").cast("string")
            max_str = F.col(f"__max_{c}").cast("string")
        return F.struct(
            F.lit(c).alias("column_name"),
            F.col("__n_rows").alias("n_rows"),
            F.col(f"__nn_{c}").alias("n_nonnull"),
            F.col(f"__nd_{c}").cast("long").alias("n_distinct"),
            min_num.alias("min_num"),
            max_num.alias("max_num"),
            min_str.alias("min_str"),
            max_str.alias("max_str"),
        )

    return wide.select(
        F.explode(F.array(*[_entry(c) for c in cols])).alias("p")
    ).select("p.*")


def _profile_exact(
    df: DataFrame, src: DataFrame, cols: list[str], by_name: dict
) -> DataFrame:
    """Exact-distinct profile body (see :func:`profile_columns`)."""
    # One struct field per distinct dtype among cols: cross-type
    # collisions are impossible (idx is in the group key) and every
    # value keeps its native type for exact grouping and min/max.
    field_of: dict[str, str] = {}
    dtypes: list[tuple[str, T.DataType]] = []
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
                # Raw payload copy: the GROUP-KEY copy is NaN/-0.0-
                # normalized by the aggregate (countDistinct semantics,
                # wanted); min/max must see the raw values.
                fields.append(val.alias(f"{field_of[key]}__raw"))
        entries.append(F.struct(*fields))

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

    # Literal spine: keeps one output row per profiled column when the
    # input is EMPTY (the aggregate then yields no idx groups at all;
    # the old wide-aggregate form yielded its single row regardless).
    spine = df.sparkSession.range(len(cols)).select(
        F.col("id").cast("int").alias("__sidx"),
        F.array(*[F.lit(c) for c in cols])[F.col("id").cast("int")].alias(
            "column_name"
        ),
    )
    j = spine.join(g2, spine["__sidx"] == g2["__idx"], "left")

    def _minmax(which: str, numeric: bool) -> Column:
        out = None
        for i, c in enumerate(cols):
            if isinstance(by_name[c], _NUMERIC_TYPES) != numeric:
                continue
            f = field_of[by_name[c].simpleString()]
            expr = F.col(f"{f}__{which}").cast("double" if numeric else "string")
            cond = F.col("__sidx") == i
            out = F.when(cond, expr) if out is None else out.when(cond, expr)
        return out if out is not None else F.lit(None)

    return j.select(
        "column_name",
        F.coalesce("__n_rows", F.lit(0)).alias("n_rows"),
        F.coalesce("__n_nonnull", F.lit(0)).alias("n_nonnull"),
        F.coalesce("__n_distinct", F.lit(0)).cast("long").alias("n_distinct"),
        _minmax("min", True).cast("double").alias("min_num"),
        _minmax("max", True).cast("double").alias("max_num"),
        _minmax("min", False).cast("string").alias("min_str"),
        _minmax("max", False).cast("string").alias("max_str"),
    )


def histogram_fixed(
    df: DataFrame,
    value_col: str,
    lo: float,
    hi: float,
    n_bins: int,
    scale: int = 100,
) -> DataFrame:
    """Equi-width histogram over a numeric column — the distribution
    companion to :func:`profile_columns` (min/max say nothing about
    shape; a 100 TB profiling pass wants both from the same scan
    discipline: map-side bin assignment, ONE keyed shuffle of at most
    ``n_bins`` partial counts).

    Bin arithmetic is integer-exact and engine-independent: values map
    to the integer grid as ``floor(value * scale)`` — the product is
    one IEEE operation and ``floor`` has no rounding-mode ambiguity
    (unlike cast-to-int, which truncates in Spark but rounds in
    DuckDB) — then the bin index is an integer division by an integer
    bin width, so every engine bins every boundary value identically.
    ``(hi-lo)*scale`` must divide evenly by ``n_bins`` (validated) so
    the width IS an integer. Out-of-range values clamp into the
    first/last bin (total count preserved — profiling wants mass, not
    silent drops). Empty bins are not emitted (join against a bin
    spine if a dense axis is needed).

    Returns ``(bin, bin_lo, bin_hi, n)``; edges are doubles computed
    from the integer grid by one division, identical cross-engine.
    """
    lo_i = round(lo * scale)
    hi_i = round(hi * scale)
    span = hi_i - lo_i
    if n_bins <= 0 or span <= 0:
        raise ValueError(f"need n_bins > 0 and hi > lo, got {n_bins}, [{lo}, {hi})")
    if span % n_bins:
        raise ValueError(
            f"(hi-lo)*scale = {span} must divide evenly into {n_bins} bins"
        )
    width_i = span // n_bins
    scaled = F.floor(F.col(value_col) * scale).cast("long")
    binned = df.select(scaled.alias("__v")).select(
        F.greatest(
            F.lit(0),
            F.least(
                F.lit(n_bins - 1),
                F.expr(f"(__v - {lo_i}) div {width_i}"),
            ),
        ).alias("bin")
    )
    return binned.groupBy("bin").agg(F.count(F.lit(1)).alias("n")).select(
        F.col("bin").cast("int").alias("bin"),
        ((F.col("bin") * width_i + F.lit(lo_i)) / scale).cast("double").alias("bin_lo"),
        (((F.col("bin") + 1) * width_i + F.lit(lo_i)) / scale)
        .cast("double")
        .alias("bin_hi"),
        "n",
    )


def zscore_outliers(
    df: DataFrame, key: str, value_col: str, k: float = 2.5
) -> DataFrame:
    """Rows whose ``value_col`` deviates more than ``k`` sample standard
    deviations from their group mean, with the z-score attached.

    Single stats pass (sum / sum-of-squares as exact DECIMAL so the
    result is identical under any partitioning — see
    ``functions/numeric.py``), then the per-key stats — one row per
    group — broadcast back onto the fact table, so the outlier screen
    is: one shuffle for the aggregate, zero shuffles on the data path.
    Variance uses the textbook identity ``(Σx² − n·mean²)/(n−1)``; both
    Σ terms are exact, and the remaining double arithmetic is a fixed
    expression tree, so any IEEE-754 engine computes bit-identical
    z-scores.

    The square is taken IN DECIMAL (``dec(v)·dec(v)``, B37's pattern),
    never as ``dec(v·v)``: squaring the double first is only exact
    while ``v²`` stays under 2⁵³ — a 4dp value of magnitude 1e9
    squares to a ~1e18 true value the double cannot hold, and the
    engines' double→decimal casts round the SAME inexact product to
    DIFFERENT decimals (Spark the shortest repr, DuckDB the binary
    value). Found by the seed-3 differential fuzz sweep (1-ulp z-score
    divergence at |value| ≈ 9.6e8).
    """
    v = F.col(value_col)
    dv = dec(v, 18, 4)
    stats = df.groupBy(key).agg(
        F.count(value_col).alias("__n"),
        davg(value_col).alias("__mean"),
        # decimal(18,4)² -> decimal(37,8): exact for any 4dp input.
        F.sum(dv * dv).cast("double").alias("__sumsq"),
    )
    sd = F.sqrt(
        (F.col("__sumsq") - F.col("__n") * F.col("__mean") * F.col("__mean"))
        / (F.col("__n") - F.lit(1))
    )
    z = (v - F.col("__mean")) / sd
    return (
        df.join(F.broadcast(stats), on=key)
        .withColumn("z", z)
        .filter(F.abs(F.col("z")) > F.lit(k))
        .drop("__n", "__mean", "__sumsq")
    )


def mode_median(
    df: DataFrame,
    group_col: str,
    value_col: str,
    bin_width: float = 1.0,
) -> DataFrame:
    """Per-group central-tendency summary (B46): the deterministic MODE
    over floor-binned values plus the exact lower-median order
    statistic. Built-in ``mode()`` is non-deterministic under ties
    (both Spark's and DuckDB's docs leave the returned tie arbitrary),
    which makes it ungradable and irreproducible across runs — here
    ties break to the SMALLEST bin, pinned by the sort. The median is
    ``binned_kth_value``'s lower median: an order statistic, not an
    interpolated percentile (interpolated medians average two doubles
    whose selection differs across engines — see q_agg_mad's note).

    Scale shape: the mode needs one (group, bin) count aggregate
    (map-side partials; only bin counts shuffle) + a window over that
    tiny counts table; the median reuses the bin-parallel selection
    from operators/ranks.py — no full-group sort anywhere. Returns one
    row per group: (group, n, median_low, mode_bin, mode_count) where
    mode_bin is the floor(value / bin_width) bin index (integer-exact
    cross-engine; cast-to-int is not — see histogram_fixed).
    """
    from pyspark.sql import Window  # noqa: PLC0415

    from pipeline_airflow_docker_spark.operators.ranks import (  # noqa: PLC0415
        binned_kth_value,
    )

    if bin_width <= 0:
        raise ValueError(f"bin_width must be positive, got {bin_width}")
    vbin = F.floor(F.col(value_col) / F.lit(float(bin_width)))
    counts = (
        df.select(group_col, vbin.alias("__vbin"))
        .groupBy(group_col, "__vbin")
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    w = Window.partitionBy(group_col).orderBy(
        F.col("__c").desc(), F.col("__vbin").asc()
    )
    mode = (
        counts.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            group_col,
            F.col("__vbin").alias("mode_bin"),
            F.col("__c").alias("mode_count"),
        )
    )
    med = binned_kth_value(
        df.select(group_col, value_col),
        group_col,
        value_col,
        bin_width,
        out_col="median_low",
    )
    return med.join(mode, group_col).select(
        group_col, "n", "median_low", "mode_bin", "mode_count"
    )


def ks_statistic(
    df: DataFrame,
    value_col: str,
    group_col: str,
    group_a: str,
    group_b: str,
    bin_width: float = 1.0,
) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov statistic (B47): the max absolute
    ECDF gap between two slices of a value column — the standard
    distribution-drift test (did this week's ingest shift against last
    week's? does split A's feature distribution match split B's?).

    Exact and deterministic: counts per distinct value are integers,
    the two ECDFs are integer-cumsum / total (one IEEE division each),
    and the gap is rounded to 6 dp before the argmax (ties then break
    to the smallest value), so any engine reproduces the same row.

    Scale shape: the naive form cumsums over a single global ordering
    — parallelism 1, the anti-pattern operators/ranks.py exists for.
    Here the cumulative counts decompose over floor(value / bin_width)
    bins exactly like binned ranks: per-(value) counts aggregate
    map-side, per-bin offsets come from a window over the TINY bin
    totals table, and the in-bin cumsums partition by bin. The argmax
    is a distributed top-1 (TakeOrderedAndProject). Returns ONE row:
    (n_a, n_b, ks_stat, at_value).
    """
    from pyspark.sql import Window  # noqa: PLC0415

    if bin_width <= 0:
        raise ValueError(f"bin_width must be positive, got {bin_width}")
    g, v = F.col(group_col), F.col(value_col)
    per_value = (
        df.filter(g.isin(group_a, group_b) & v.isNotNull())
        .groupBy(value_col)
        .agg(
            F.sum(F.when(g == group_a, 1).otherwise(0)).alias("__ca"),
            F.sum(F.when(g == group_b, 1).otherwise(0)).alias("__cb"),
        )
        .withColumn("__bin", F.floor(v / F.lit(float(bin_width))))
    )
    bin_tot = per_value.groupBy("__bin").agg(
        F.sum("__ca").alias("__ba"), F.sum("__cb").alias("__bb")
    )
    w_off = Window.orderBy("__bin").rowsBetween(
        Window.unboundedPreceding, -1
    )  # bin-totals table only — never the fact rows
    offsets = bin_tot.select(
        "__bin",
        F.coalesce(F.sum("__ba").over(w_off), F.lit(0)).alias("__oa"),
        F.coalesce(F.sum("__bb").over(w_off), F.lit(0)).alias("__ob"),
    )
    totals = bin_tot.agg(
        F.sum("__ba").alias("n_a"), F.sum("__bb").alias("n_b")
    )
    w_bin = (
        Window.partitionBy("__bin")
        .orderBy(value_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = per_value.join(F.broadcast(offsets), "__bin").select(
        value_col,
        (F.col("__oa") + F.sum("__ca").over(w_bin)).alias("__cuma"),
        (F.col("__ob") + F.sum("__cb").over(w_bin)).alias("__cumb"),
    )
    gap = F.round(
        F.abs(
            F.col("__cuma").cast("double") / F.col("n_a")
            - F.col("__cumb").cast("double") / F.col("n_b")
        ),
        6,
    )
    return (
        cum.crossJoin(F.broadcast(totals))
        .select(
            "n_a",
            "n_b",
            gap.alias("ks_stat"),
            F.col(value_col).alias("at_value"),
        )
        .orderBy(F.col("ks_stat").desc(), F.col("at_value").asc())
        .limit(1)
    )
