"""Scalable exact ranking for low-cardinality groups.

``rank() OVER (PARTITION BY group ORDER BY value)`` has parallelism
equal to the number of GROUPS: with 3 return-flags, a 60 M-row rank
runs its sorts on 3 tasks no matter how many executors exist (measured
97 s at sf10 — the registry's slowest plan before this module). The
classic distributed fix decomposes the global per-group rank into

    rank(g, x) = (# rows of g in strictly earlier bins) +
                 rank of x within its own (g, bin)

with ``bin = floor(x / bin_width)``: value-contiguous bins mean
in-bin ranks + a per-bin offset reproduce the global rank EXACTLY
(ties never cross bins — equal values share a bin by construction).
The expensive sort now partitions by (group, bin) — parallelism is
groups × bins and scales with the chosen width, while the offset table
is a tiny (group, bin) count aggregate that broadcast-joins back.

Deterministic everywhere: floor on IEEE doubles, integer counts, and
the same rank values any single-node engine computes — so oracles can
grade with a plain ``rank()`` window and results hash-match.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def join_group_nullsafe(
    left: DataFrame,
    right: DataFrame,
    cols: list[str],
    broadcast: bool = True,
) -> DataFrame:
    """Inner join on ``cols`` with NULL-SAFE equality (``<=>``),
    keeping one copy of the join columns (USING semantics).

    SQL GROUP BY / PARTITION BY treat NULL as a real group, but a
    plain equi-join never matches NULL keys — so every
    "aggregate-then-join-back" decomposition in this module silently
    DROPPED the NULL group while the window formulation it replaces
    kept it (found by the seeded fuzz fixture, round 7:
    q_corr_spearman / q_agg_mad / q_quantile_bucket lost the
    NULL-flag group). ``<=>`` is still an equi-predicate: Catalyst
    plans the same BroadcastHashJoin, so the scale shape is unchanged.
    """
    r = right
    for c in cols:
        r = r.withColumnRenamed(c, f"__r_{c}")
    cond = None
    for c in cols:
        e = F.col(c).eqNullSafe(F.col(f"__r_{c}"))
        cond = e if cond is None else cond & e
    rhs = F.broadcast(r) if broadcast else r
    return left.join(rhs, cond).drop(*[f"__r_{c}" for c in cols])


def binned_scaled_rank(
    df: DataFrame,
    group_col: str,
    value_col: str,
    bin_width: float,
    out_col: str = "r",
) -> DataFrame:
    """Append ``out_col`` = ``2*rank + ties - 1`` (DECIMAL(18,0)) — the
    integer-scaled AVERAGE rank of ``value_col`` within ``group_col``
    (2x the classic ``rank + (ties-1)/2``; correlation and other
    affine-invariant consumers are unaffected by the doubling, which
    keeps every intermediate an exact integer).

    One (group, bin) data shuffle for the in-bin rank windows (the tie
    count rides the same window spec via a peers RANGE frame), plus a
    count aggregate whose per-(group, bin) totals — thousands of rows,
    never the fact table — take a prefix-sum window on the GROUP only
    and broadcast back as offsets. ``bin_width`` trades parallelism
    (groups x bins tasks) against offset-table size; any positive
    width is correct.
    """
    return binned_scaled_ranks(df, group_col, [(value_col, bin_width, out_col)])


def binned_scaled_ranks(
    df: DataFrame,
    group_col: str,
    specs: list[tuple[str, float, str]],
    counts_from: DataFrame | None = None,
) -> DataFrame:
    """Multi-axis :func:`binned_scaled_rank`: append one scaled-rank
    column per ``(value_col, bin_width, out_col)`` spec in a single
    composition.

    Chaining single-axis calls duplicates work: axis N's count
    aggregate would be planned over axis N-1's OUTPUT, so Catalyst
    re-plans (and re-executes) every earlier axis's window sort under
    each later axis's counts subtree — measured 4 lineitem scans and
    12 exchanges for two axes on q_corr_spearman. Here every count
    table derives from the ORIGINAL input (all bin columns are
    map-side projections of it), so the expensive in-bin window sorts
    are planned exactly once each, chained back-to-back on the same
    lineage: 2 axes = 2 fact shuffles (one per axis order) + 2 cheap
    count aggregates + broadcast offset joins.

    ``counts_from`` (r17 optimization round): derive the count tables
    from this relation instead of ``df``. Pass the UNDECORATED base
    relation when ``df`` itself carries prior decorations (an earlier
    rank-join, a scale-adaptive ``spread`` exchange) that the counts
    don't need — otherwise every decoration is re-planned (and
    re-executed) inside each axis's counts subtree. The caller
    guarantees ``counts_from`` has the same multiset of
    (group, value) rows as ``df``; ranks are pure functions of that
    multiset, so the output is unchanged.
    """
    for _, bin_width, _ in specs:
        if bin_width <= 0:
            raise ValueError(f"bin_width must be positive, got {bin_width}")
    bins = {
        out: F.floor(F.col(val) / F.lit(float(w))) for val, w, out in specs
    }
    binned = df
    for out, col in bins.items():
        binned = binned.withColumn(f"__bin_{out}", col)
    counts_src = binned
    if counts_from is not None:
        counts_src = counts_from
        for out, col in bins.items():
            counts_src = counts_src.withColumn(f"__bin_{out}", col)

    out = binned
    for value_col, _, out_col in specs:
        b = f"__bin_{out_col}"
        # Counts come from `counts_src` (the shared map-side projection
        # of the input), never from `out` — this is what keeps earlier
        # axes' window sorts out of later axes' count subtrees.
        counts = counts_src.groupBy(group_col, b).agg(
            F.count(F.lit(1)).alias("__n")
        )
        w_off = (
            Window.partitionBy(group_col)
            .orderBy(b)
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        offsets = counts.select(
            group_col,
            b,
            F.coalesce(F.sum("__n").over(w_off), F.lit(0)).alias("__offset"),
        )
        w_bin = Window.partitionBy(group_col, b).orderBy(value_col)
        w_ties = w_bin.rangeBetween(Window.currentRow, Window.currentRow)
        local = 2 * (F.col("__offset") + F.rank().over(w_bin)) + F.count(
            F.lit(1)
        ).over(w_ties) - F.lit(1)
        out = (
            join_group_nullsafe(out, offsets, [group_col, b])
            .withColumn(out_col, local.cast("decimal(18,0)"))
            .drop("__offset")
        )
    return out.drop(*[f"__bin_{o}" for _, _, o in specs])


def scaled_rank_by_value(
    df: DataFrame,
    group_col: str,
    value_col: str,
    out_col: str = "r",
    counts_from: DataFrame | None = None,
) -> DataFrame:
    """Append ``out_col`` = ``2*rank + ties - 1`` (identical contract
    to :func:`binned_scaled_rank`) for a DOMAIN-BOUNDED value column —
    computed with ZERO sorts or shuffles of the fact table.

    The scaled average rank is a pure function of (group, value):
    ``2*(#strictly smaller) + (#equal) + 1``. So it is computed on the
    per-(group, distinct-value) count table — one map-side-partial
    aggregate whose shuffle carries only distinct pairs — prefix-summed
    per group (a window over the tiny table), and broadcast-joined
    back. The fact table itself is never sorted, never shuffled.

    Use when ``group_col × value_col`` distinct pairs comfortably
    broadcast (domain-bounded measures: quantities, flags, small-grid
    prices). For unbounded/continuous values the lookup table grows
    with the data — use :func:`binned_scaled_rank`, which bounds
    per-task sort size instead.

    ``counts_from``: derive the lookup table from this relation
    instead of ``df`` — same contract and rationale as
    :func:`binned_scaled_ranks`; the (group, value) multiset must be
    identical, so the looked-up ranks are identical.
    """
    src = counts_from if counts_from is not None else df
    vc = src.groupBy(group_col, value_col).agg(F.count(F.lit(1)).alias("__n"))
    w_before = (
        Window.partitionBy(group_col)
        .orderBy(value_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    lut = vc.select(
        group_col,
        value_col,
        (
            2 * F.coalesce(F.sum("__n").over(w_before), F.lit(0))
            + F.col("__n")
            + F.lit(1)
        ).cast("decimal(18,0)").alias(out_col),
    )
    return join_group_nullsafe(df, lut, [group_col, value_col])


def kth_value_by_counts(
    df: DataFrame,
    group_col: str,
    value_col: str,
    out_col: str = "kth_value",
    n_col: str = "n",
    k_of_n=None,
) -> DataFrame:
    """Per-group k-th order statistic for a DOMAIN-BOUNDED value
    column — no row of the fact table is ever ranked or sorted.

    The order statistic is read off the per-(group, distinct-value)
    count table: one map-side-partial aggregate (the shuffle carries
    only distinct pairs), cumulative counts per group (a window over
    the tiny table), and the row where the cumulative count first
    reaches position k IS the k-th value. Same ``k_of_n`` contract as
    :func:`binned_kth_value` (default lower median ``(n+1) div 2``);
    returns one row per group: ``(group_col, n_col, out_col)``.

    For unbounded/continuous values the count table approaches the
    fact table and its per-group window becomes the group-count-
    parallelism sort this module exists to avoid — use
    :func:`binned_kth_value` there.
    """
    if k_of_n is None:
        k_of_n = lambda n: F.floor((n + F.lit(1)) / 2)  # noqa: E731
    vc = df.groupBy(group_col, value_col).agg(F.count(F.lit(1)).alias("__vn"))
    w_cum = (
        Window.partitionBy(group_col)
        .orderBy(value_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_all = Window.partitionBy(group_col)
    marked = vc.select(
        group_col,
        value_col,
        (F.sum("__vn").over(w_cum) - F.col("__vn")).alias("__before"),
        F.sum("__vn").over(w_cum).alias("__incl"),
        F.sum("__vn").over(w_all).alias(n_col),
    )
    k = k_of_n(F.col(n_col))
    return marked.filter(
        (F.col("__before") < k) & (k <= F.col("__incl"))
    ).select(group_col, n_col, F.col(value_col).alias(out_col))


def binned_kth_value(
    df: DataFrame,
    group_col: str,
    value_col: str,
    bin_width: float,
    out_col: str = "kth_value",
    n_col: str = "n",
    k_of_n=None,
) -> DataFrame:
    """Per-group k-th order statistic WITHOUT a full sort: one
    (group, bin) count aggregate (map-side partial — only bin totals
    cross the network) locates the single bin that contains position
    k, then a row_number window ranks ONLY that bin's rows
    (~n/n_bins of the data). The flag-only window form sorts the whole
    group on one task; this form never sorts more than one bin.

    ``k_of_n`` maps the group's row count (a Column) to the wanted
    position, default the LOWER MEDIAN ``(n+1) div 2`` — the
    engine-exact order statistic the MAD/median qkeys pin (see
    plans/relational.py::q_agg_mad on why interpolated medians don't
    cross engines). Returns one row per group:
    ``(group_col, n_col, out_col)``. Deterministic: the value at a
    rank position is unique even under ties.
    """
    if bin_width <= 0:
        raise ValueError(f"bin_width must be positive, got {bin_width}")
    if k_of_n is None:
        k_of_n = lambda n: F.floor((n + F.lit(1)) / 2)  # noqa: E731
    binned = df.withColumn("__bin", F.floor(F.col(value_col) / F.lit(float(bin_width))))
    counts = binned.groupBy(group_col, "__bin").agg(
        F.count(F.lit(1)).alias("__bn")
    )
    w_cum = (
        Window.partitionBy(group_col)
        .orderBy("__bin")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_all = Window.partitionBy(group_col)
    marked = counts.select(
        group_col,
        "__bin",
        (F.sum("__bn").over(w_cum) - F.col("__bn")).alias("__before"),
        F.sum("__bn").over(w_cum).alias("__incl"),
        F.sum("__bn").over(w_all).alias(n_col),
    )
    k = k_of_n(F.col(n_col))
    target = marked.filter(
        (F.col("__before") < k) & (k <= F.col("__incl"))
    ).select(group_col, "__bin", "__before", n_col)
    w_bin = Window.partitionBy(group_col, "__bin").orderBy(value_col)
    picked = (
        join_group_nullsafe(binned, target, [group_col, "__bin"])
        .withColumn("__rn", F.row_number().over(w_bin))
        .filter(F.col("__rn") == k_of_n(F.col(n_col)) - F.col("__before"))
    )
    return picked.select(
        group_col, n_col, F.col(value_col).alias(out_col)
    )


def binned_ntile(
    df: DataFrame,
    group_col: str,
    value_col: str,
    n_tiles: int,
    tiebreak_cols: list[str] | None = None,
    bin_width: float = 1.0,
    out_col: str = "tier",
) -> DataFrame:
    """Append ``out_col`` = the SQL ``ntile(n_tiles)`` bucket of each
    row within its group, ordered by ``(value_col, *tiebreak_cols)`` —
    computed with groups x bins parallelism instead of one task per
    group. ntile is positional: with q = n div n_tiles and
    r = n mod n_tiles, the first r buckets hold q+1 rows. The global
    row_number decomposes exactly like the rank in
    ``binned_scaled_rank`` (in-bin row_number + per-bin offset; value
    ties never cross bins, and the tiebreak columns order rows within
    a bin just as they would globally), and the bucket is then pure
    arithmetic on (row_number, n). Requires a total order for
    determinism — pass tiebreak columns unless value_col is unique.
    """
    if n_tiles <= 0:
        raise ValueError(f"n_tiles must be positive, got {n_tiles}")
    if bin_width <= 0:
        raise ValueError(f"bin_width must be positive, got {bin_width}")
    tiebreaks = tiebreak_cols or []
    binned = df.withColumn(
        "__bin", F.floor(F.col(value_col) / F.lit(float(bin_width)))
    )
    counts = binned.groupBy(group_col, "__bin").agg(
        F.count(F.lit(1)).alias("__bn")
    )
    w_off = (
        Window.partitionBy(group_col)
        .orderBy("__bin")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_all = Window.partitionBy(group_col)
    offsets = counts.select(
        group_col,
        "__bin",
        F.coalesce(F.sum("__bn").over(w_off), F.lit(0)).alias("__offset"),
        F.sum("__bn").over(w_all).alias("__gn"),
    )
    w_bin = Window.partitionBy(group_col, "__bin").orderBy(value_col, *tiebreaks)
    rn = F.col("__offset") + F.row_number().over(w_bin)
    n, t = F.col("__gn"), F.lit(n_tiles)
    q, r = F.floor(n / t), n % t
    big = r * (q + 1)
    tier = F.when(rn <= big, F.ceil(rn / (q + 1))).otherwise(
        r + F.ceil((rn - big) / q)
    )
    return (
        join_group_nullsafe(binned, offsets, [group_col, "__bin"])
        .withColumn(out_col, tier.cast("int"))
        .drop("__bin", "__offset", "__gn")
    )


__all__ = [
    "binned_kth_value",
    "join_group_nullsafe",
    "binned_ntile",
    "binned_scaled_rank",
    "binned_scaled_ranks",
    "kth_value_by_counts",
    "scaled_rank_by_value",
]
