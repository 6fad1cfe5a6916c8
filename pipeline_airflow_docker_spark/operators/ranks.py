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
    if bin_width <= 0:
        raise ValueError(f"bin_width must be positive, got {bin_width}")
    bin_col = F.floor(F.col(value_col) / F.lit(float(bin_width)))

    binned = df.withColumn("__bin", bin_col)
    counts = binned.groupBy(group_col, "__bin").agg(
        F.count(F.lit(1)).alias("__n")
    )
    w_off = (
        Window.partitionBy(group_col)
        .orderBy("__bin")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.select(
        group_col,
        "__bin",
        F.coalesce(F.sum("__n").over(w_off), F.lit(0)).alias("__offset"),
    )
    w_bin = Window.partitionBy(group_col, "__bin").orderBy(value_col)
    w_ties = w_bin.rangeBetween(Window.currentRow, Window.currentRow)
    local = 2 * (F.col("__offset") + F.rank().over(w_bin)) + F.count(
        F.lit(1)
    ).over(w_ties) - F.lit(1)
    return (
        binned.join(F.broadcast(offsets), [group_col, "__bin"])
        .withColumn(out_col, local.cast("decimal(18,0)"))
        .drop("__bin", "__offset")
    )


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
        binned.join(F.broadcast(target), [group_col, "__bin"])
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
        binned.join(F.broadcast(offsets), [group_col, "__bin"])
        .withColumn(out_col, tier.cast("int"))
        .drop("__bin", "__offset", "__gn")
    )


__all__ = ["binned_kth_value", "binned_ntile", "binned_scaled_rank"]
