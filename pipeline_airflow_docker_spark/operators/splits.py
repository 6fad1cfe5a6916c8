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

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from pipeline_airflow_docker_spark.functions.text import seeded_md5

N_BUCKETS = 1000  # per-mille split resolution


def hash_bucket(key: Column, seed: int = 42) -> Column:
    """Stable bucket in [0, 1000): first 8 hex digits of seeded md5,
    as an integer, mod 1000. Uniform (md5), reproducible anywhere."""
    h = seeded_md5(key.cast("string"), seed)
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % N_BUCKETS


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
