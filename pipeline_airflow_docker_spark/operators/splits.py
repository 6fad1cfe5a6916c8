"""Deterministic dataset splitting for training pipelines (Part C).

``df.randomSplit`` is the obvious tool and the wrong one for a corpus
that gets reprocessed: assignment depends on partitioning and sampling
seed plumbing, so a document can change sides between runs. Training
pipelines need *content-addressed* splits — each key hashes to a
bucket, so membership is a pure function of the key: stable across
runs, engines, cluster sizes, and corpus growth (new documents land in
splits at the target rates without moving old ones). Same md5
primitive as functions/text.py, so the DuckDB oracle reproduces the
exact assignment (q_split_hash).

Map-side only: the split column is one projection — no shuffle, no
sampling pass, composes with partition pruning when the split column
is used as a partition key on write.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence
from functools import reduce

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from pipeline_airflow_docker_spark.functions.materialize import link, materialize
from pipeline_airflow_docker_spark.functions.text import seeded_md5

N_BUCKETS = 1000  # per-mille split resolution


def hash_mod(key: Column, modulus: int, seed: int = 42) -> Column:
    """First 8 hex digits of seeded md5 as an integer, mod ``modulus``
    — the stable content-addressed assignment primitive. Uniform (md5),
    reproducible in any engine with md5."""
    h = seeded_md5(key.cast("string"), seed)
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % modulus


def hash_bucket(key: Column, seed: int = 42) -> Column:
    """Stable bucket in [0, 1000)."""
    return hash_mod(key, N_BUCKETS, seed)


def hash_split(
    df: DataFrame,
    key_col: str,
    splits: dict[str, float] | None = None,
    seed: int = 42,
    split_col: str = "split",
) -> DataFrame:
    """Assign every row to a named split by key hash.

    ``splits`` maps name -> fraction (must sum to 1.0); assignment is
    by cumulative per-mille boundary in dict order. Default 80/10/10
    train/val/test.
    """
    splits = splits or {"train": 0.8, "val": 0.1, "test": 0.1}
    total = sum(splits.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split fractions must sum to 1, got {total}")
    bucket = hash_bucket(F.col(key_col), seed)
    expr: Column | None = None
    acc = 0.0
    names = list(splits)
    for name in names[:-1]:
        acc += splits[name]
        bound = round(acc * N_BUCKETS)
        cond = bucket < F.lit(bound)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    expr = (
        F.lit(names[-1]) if expr is None else expr.otherwise(names[-1])
    )
    return df.withColumn(split_col, expr)


def stratified_downsample(
    df: DataFrame,
    group_cols: str | Sequence[str],
    n_per_group: int,
    key_col: str,
    seed: int = 42,
) -> DataFrame:
    """Cap every group at ``n_per_group`` rows, chosen by hash order —
    deterministic downsampling of over-represented strata (sources,
    languages, domains) that `df.sampleBy` can't give you: the kept set
    is stable across runs, engines, partitionings, and corpus growth
    (a row's fate depends only on its own key hash rank within its
    group, with the key itself breaking seeded-hash ties).

    One shuffle on ``group_cols`` (the ranking window); no driver-side
    sampling state. Heavily skewed strata make that window's partition
    hot — at 100 TB pre-filter obviously-capped groups with an
    approximate count, or use the two-pass per-mille variant
    (hash_bucket < p) when an exact cap isn't required.
    """
    groups = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    w = Window.partitionBy(*groups).orderBy(
        seeded_md5(F.col(key_col).cast("string"), seed), F.col(key_col)
    )
    return (
        df.withColumn("__rank", F.row_number().over(w))
        .filter(F.col("__rank") <= n_per_group)
        .drop("__rank")
    )


def mix_corpora(
    corpora: Mapping[str, tuple[DataFrame, float]],
    key_col: str,
    seed: int = 42,
    corpus_col: str = "corpus",
) -> DataFrame:
    """Weighted corpus mixing for training-data assembly: union the
    given corpora, keeping each row with its corpus's sampling rate —
    the "data mixture" step that turns N raw corpora into one training
    stream with target proportions (e.g. web 25%, books 100%).

    Content-addressed like hash_split: a row's fate is a pure function
    of (key, seed), so rates are exact in expectation, stable across
    runs/engines/partitionings, and re-running after corpus growth
    keeps every previously-selected row selected. Map-side only: one
    filter + literal tag per corpus and a union — no shuffle, no
    sampling pass, no driver state. Schemas must be union-compatible;
    rate 1.0 keeps everything.
    """
    parts: list[DataFrame] = []
    for name, (df, rate) in corpora.items():
        if not 0.0 < rate <= 1.0:
            raise ValueError(f"corpus {name!r}: rate must be in (0, 1], got {rate}")
        # round() alone would send rates < 1/(2*N_BUCKETS) to bound 0 and
        # silently drop the whole corpus despite passing the rate check;
        # a validated-nonzero rate always keeps at least one bucket.
        bound = max(1, round(rate * N_BUCKETS))
        parts.append(
            df.filter(hash_bucket(F.col(key_col), seed) < bound).withColumn(
                corpus_col, F.lit(name)
            )
        )
    if not parts:
        raise ValueError("no corpora given")
    return reduce(lambda a, b: a.unionByName(b), parts)


def shard_assign(
    df: DataFrame,
    key_col: str,
    n_shards: int,
    seed: int = 42,
    shard_col: str = "shard",
) -> DataFrame:
    """Content-addressed shard id in [0, n_shards) — deterministic,
    uniform, engine-independent. Map-side projection."""
    if n_shards <= 0:
        raise ValueError(f"n_shards must be positive, got {n_shards}")
    return df.withColumn(
        shard_col, hash_mod(F.col(key_col), n_shards, seed).cast("int")
    )


def shuffled_order(
    df: DataFrame,
    key_col: str,
    n_shards: int = 16,
    seed: int = 42,
    shard_col: str = "shard",
    pos_col: str = "pos",
) -> DataFrame:
    """Deterministic global shuffle for training order: every row gets
    a ``(shard, pos)`` coordinate; reading shards in index order and
    rows within a shard by ``pos`` yields a fixed pseudo-random
    permutation of the corpus — what a trainer needs before epoch 0,
    reproducible across runs/engines/partitionings (content-addressed,
    like every split in this module).

    Two independent seeded hashes: ``seed`` places the row in a shard,
    ``seed+1`` orders it within the shard, so within-shard order is
    uncorrelated with shard assignment. Scale shape: a true global
    ``row_number() OVER (ORDER BY hash)`` funnels 100 TB through ONE
    window partition; sharding first bounds every window partition to
    ~1/n_shards of the data — same parallel-window pattern as
    ``write_training_shards`` — and n_shards scales with the corpus.
    The (shard, pos) pair is a total order (pos dense within shard);
    consumers needing one global ordinal compute
    ``pos_global = pos-1 + cum_rows(shard)`` from the n_shards-row
    shard-size table.
    """
    shard = hash_mod(F.col(key_col), n_shards, seed).cast("int")
    order_h = seeded_md5(F.col(key_col).cast("string"), seed + 1)
    w = Window.partitionBy(shard_col).orderBy(order_h, F.col(key_col))
    return (
        df.withColumn(shard_col, shard)
        .withColumn(pos_col, F.row_number().over(w))
    )


def global_row_index(
    df: DataFrame,
    order_col: str,
    n_shards: int = 32,
    idx_col: str = "idx",
) -> DataFrame:
    """Global DENSE 1-based index by total order on ``order_col`` —
    ``ROW_NUMBER() OVER (ORDER BY order_col)`` semantics — computed
    WITHOUT a global window (round 11; the naive form funnels the
    whole corpus through ONE window partition, a single-task sort at
    100 TB):

    1. approximate quantile boundaries of ``order_col`` (one pass,
       n_shards-1 scalars to the driver),
    2. range-shard on the boundaries (map-side; ranges, not hashes,
       so cross-shard order is consistent with the total order),
    3. ``row_number`` within each shard (parallel windows, each
       ~1/n_shards of the data),
    4. add EXACT per-shard offsets (one n_shards-row count aggregate,
       cumulated driver-side, broadcast back as a literal map).

    Boundary placement only affects shard SIZES, never the final
    index — offsets are exact counts — so approximate percentiles are
    safe. Both driver collects are bounded by ``n_shards`` (the IVF
    quantizer pattern). ``order_col`` must be non-null and should be
    unique: ties order arbitrarily within the tie (exactly like the
    SQL form), and a tie spanning nothing worse — the boundary
    predicate is a closed comparison, so all copies of one value land
    in one shard. NUMERIC/TIMESTAMP/DATE keys get percentile_approx
    boundaries; any other orderable type (the common 100 TB case is a
    hash-shaped STRING doc id) gets boundaries from a seeded bounded
    sample — equally safe, since placement only affects shard sizes.

    ``idx`` is BIGINT end-to-end: the operator exists precisely for
    corpora past the single-task-sort ceiling, and an int32 index
    silently wraps past 2,147,483,647 rows under non-ANSI Spark —
    offsets and the row_number sum are computed in LONG. Callers
    needing an int32 contract cast at the call site and own the
    ceiling.

    The sharded frame is materialized before the offset count so the
    count job and the returned plan read the SAME rows — without it,
    a non-deterministic ``df`` (or a source mutating between the two
    jobs) desyncs offsets from shard contents and the index silently
    gains gaps/duplicates. Release via ``release(result)`` (the
    materialization is link()-ed to the returned frame).
    """
    w_shard = Window.partitionBy("__shard").orderBy(order_col)
    if n_shards >= 2:
        from pyspark.sql.types import DateType, NumericType, TimestampType  # noqa: PLC0415

        dt = df.schema[order_col].dataType
        if isinstance(dt, (NumericType, TimestampType, DateType)):
            probs = [i / n_shards for i in range(1, n_shards)]
            bounds = df.select(
                F.percentile_approx(order_col, probs, 10_000).alias("b")
            ).first()["b"]
        else:
            # STRING (or any orderable non-numeric) keys — the common
            # 100 TB case is a hash-shaped string doc id, and
            # percentile_approx rejects strings. Boundaries come from a
            # seeded bounded sample instead (r12): placement only
            # affects shard SIZES, never the index (offsets are exact
            # counts), so sampling is safe by the same argument as
            # approximate percentiles. One count job sizes the
            # fraction; the collect is capped at ~200 keys per shard.
            target = min(200 * n_shards, 100_000)
            n_rows = df.count()
            if n_rows == 0:
                bounds = None
            else:
                frac = min(1.0, (3.0 * target) / n_rows)
                keys = sorted(
                    r[0]
                    for r in df.select(order_col)
                    .where(F.col(order_col).isNotNull())
                    .sample(fraction=frac, seed=42)
                    .limit(target)
                    .collect()
                )
                step = max(1, len(keys) // n_shards)
                bounds = keys[step::step][: n_shards - 1] or None
    else:
        bounds = None
    if not bounds:
        # Empty input, all-null keys, or n_shards=1: degenerate to the
        # plain window (zero rows / caller explicitly chose serial).
        out = df.withColumn("__shard", F.lit(0))
        return (
            out.withColumn(
                idx_col, F.row_number().over(w_shard).cast("bigint")
            )
            .drop("__shard")
        )
    uniq = sorted(set(bounds))  # heavy skew can repeat a boundary
    # shard = how many boundaries the key exceeds. ONE flat expression
    # node (array filter), not a chained when()-tree — a chain of
    # n_shards additions overflowed the JVM analyzer stack at 1000
    # shards (found by the operator's own tests).
    bounds_arr = F.array(*[F.lit(b) for b in uniq])
    shard: Column = F.size(F.filter(bounds_arr, lambda b: F.col(order_col) > b))
    # Materialized: the offset-count job below and the returned plan
    # must read the SAME rows (non-deterministic input / a mutating
    # source would otherwise desync exact offsets from shard contents).
    sharded = materialize(df.withColumn("__shard", shard.cast("int")))
    counts = {
        r["__shard"]: r["count"]
        for r in sharded.groupBy("__shard").count().collect()
    }
    offsets: list[Column] = []
    acc = 0
    for s in range(len(uniq) + 1):
        # LONG literals: cumulative offsets exceed int32 in exactly
        # the >2.147B-row regime this operator exists for, and under
        # non-ANSI Spark an int32 sum wraps silently.
        offsets += [F.lit(s), F.lit(acc).cast("bigint")]
        acc += counts.get(s, 0)
    off = F.element_at(F.create_map(*offsets), F.col("__shard"))
    out = (
        sharded.withColumn(
            idx_col, F.row_number().over(w_shard).cast("bigint") + off
        )
        .drop("__shard")
    )
    link(out, sharded)
    return out


def write_training_shards(
    df: DataFrame,
    path: str,
    key_col: str,
    n_shards: int,
    sort_cols: Sequence[str] = (),
    seed: int = 42,
) -> None:
    """Training-shard export: the last step of a data pipeline — a
    deterministic N-way shard layout trainers can map to dataloader
    workers, with stable within-shard order.

    One shuffle (repartition on the shard id), sort within each
    partition (no global sort), one file per shard per partition
    under ``shard=<k>/`` directories. Readers get partition pruning on
    the shard column for free; re-exports are byte-stable because both
    assignment and order are content-addressed, which makes training
    runs reproducible and shard diffs meaningful.
    """
    out = shard_assign(df, key_col, n_shards, seed)
    out = out.repartition(n_shards, F.col("shard"))
    if sort_cols:
        out = out.sortWithinPartitions("shard", *sort_cols)
    out.write.mode("overwrite").partitionBy("shard").parquet(path)


def temperature_downsample(
    df: DataFrame,
    group_col: str,
    key_col: str,
    alpha: float = 0.5,
    seed: int = 42,
    rate_col: str | None = None,
) -> DataFrame:
    """Temperature-scaled mixture sampling: downsample each group
    (language, source, domain) so the surviving corpus mixes groups
    proportionally to ``count**alpha`` — the standard multilingual
    rebalance (alpha=1 keeps natural proportions, alpha->0 approaches
    uniform; mT5/XLM-R train at alpha≈0.3-0.7). Filtering can only
    remove rows, so the mix is anchored at the SMALLEST group: it keeps
    everything (rate 1.0) and every larger group keeps
    ``(n_min/n)**(1-alpha)`` of its rows, which yields kept counts
    proportional to ``n**alpha`` exactly.

    Deterministic cross-engine: membership is the content-addressed
    ``hash_bucket(key) < floor(rate * 1000)`` per-mille test (same md5
    primitive as every split here), and for the default alpha=0.5 the
    rate is computed as ``sqrt(n_min/n)`` — IEEE division and sqrt are
    correctly rounded, so the boundary integer is bit-identical in any
    engine (general ``pow`` carries no such guarantee; non-default
    alphas are engine-deterministic but not oracle-exact).

    Scale shape: ONE grouped count over the corpus (map-side partial
    agg, tiny result), the global min taken by a single-partition
    window over that counts table (n_groups rows — langs/sources, not
    documents; an agg-and-rejoin would plan the count subtree twice
    and scan the corpus again), then the per-group bound broadcasts to
    the fact side — the corpus itself never shuffles; the keep test is
    a map-side projection.

    Rows with a NULL ``group_col`` are dropped (no count stratum to
    anchor a rate; the equi-join is not null-safe) — fillna a sentinel
    group upstream if unknown-language docs should survive.
    """
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("__n"))
    w_all = Window.partitionBy()  # counts table only — never the corpus
    ratio = F.min("__n").over(w_all).cast("double") / F.col("__n").cast("double")
    rate = F.sqrt(ratio) if alpha == 0.5 else F.pow(ratio, F.lit(1.0 - alpha))
    bounds = counts.select(
        group_col,
        rate.alias("__rate"),
        F.floor(rate * N_BUCKETS).cast("long").alias("__bound"),
    )
    kept = df.join(F.broadcast(bounds), group_col).filter(
        hash_bucket(F.col(key_col), seed) < F.col("__bound")
    )
    if rate_col is not None:
        return kept.withColumnRenamed("__rate", rate_col).drop("__bound")
    return kept.drop("__rate", "__bound")


def cap_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    cap: int,
    key_col: str,
    seed: int = 42,
    rank_col: str = "cap_rank",
) -> DataFrame:
    """Absolute per-group document cap (C27) — the RefinedWeb-style
    "at most N documents per domain" rule that stops a handful of huge
    sources from dominating a training mix (the proportional
    counterparts are ``stratified_downsample`` / the temperature mix;
    a cap is the right tool when the policy is a hard ceiling, not a
    rate). Which N survive is content-addressed: priority is the
    seeded md5 of the key, so membership is a pure function of
    (key, seed) — stable across runs, engines, and corpus growth —
    and NOT "first N in file order", which would bias toward whatever
    the ingest happened to write first.

    One keyed shuffle: row_number over (group, md5-priority). Skewed
    mega-groups sort only their own partition; cap >> group sizes is a
    no-op that still costs the shuffle — filter trivial groups first
    if that matters.
    """
    if cap <= 0:
        raise ValueError(f"cap must be positive, got {cap}")
    prio = seeded_md5(F.col(key_col).cast("string"), seed)
    w = Window.partitionBy(*group_cols).orderBy(prio, key_col)
    return df.withColumn(rank_col, F.row_number().over(w)).filter(
        F.col(rank_col) <= cap
    )


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    k: int,
    key_col: str,
    seed: int = 42,
    score_col: str = "sample_score",
) -> DataFrame:
    """Weighted sampling without replacement (C28), Efraimidis–Spirakis
    A-ES: each row draws u ~ U(0,1) and is ranked by u^(1/w) — taking
    the top k selects each row with probability proportional to its
    weight, in ONE distributed pass (the classic use: length- or
    quality-weighted corpus subsampling). Equivalently ranked by
    ln(u)/w, which avoids the pow() and keeps magnitudes sane.

    u is content-addressed — the first 8 md5 hex digits of the seeded
    key over 2^32, the same primitive as ``hash_mod`` — so the sample
    is a pure function of (key set, seed): reproducible across runs,
    engines, partitionings, and cluster sizes, unlike ``sample()``
    whose output depends on partition layout. The score is rounded to
    9 dp (ties then break on the key) so rank order survives any
    last-ulp ln() disagreement between engines.

    Scale shape: map-side score projection + distributed top-k
    (TakeOrderedAndProject — per-partition heaps, never a global
    sort). Weights must be strictly positive; null/non-positive
    weights are dropped.
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    u = (
        hash_mod(F.col(key_col), 2**32, seed).cast("double") + F.lit(0.5)
    ) / F.lit(float(2**32))
    score = F.round(F.log(u) / F.col(weight_col), 9)
    return (
        df.filter(F.col(weight_col) > 0)
        .withColumn(score_col, score)
        .orderBy(F.col(score_col).desc(), F.col(key_col))
        .limit(k)
    )
