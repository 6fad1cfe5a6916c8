"""Cleaning / validation operators.

Reference behaviors re-expressed (citations into /root/reference/):
- ``dropna()``            -> drop_null_rows(how="any")   [dags/etl_data_pipeline.py:23]
- ``dropna(how='all')``   -> drop_null_rows(how="all")   [dags/etl_data_pipeline_mongodb_complex.py:40]
- ``validate_data``       -> require_keys                [dags/kafka_to_mongo_pipeline_enchanced.py:31-42]

Parity note (SURVEY.md §7 "what's hard" #1): pandas ``dropna`` treats
NaN and None identically; Spark's ``DataFrameNaFunctions.drop`` also
drops NaN for float/double columns, so the semantics line up without a
compat shim. Both operators are plain filters — Catalyst pushes them
into the Parquet scan, so at 100 TB they cost a row-group skip, not a
full pass.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def drop_null_rows(
    df: DataFrame, how: str = "any", subset: Sequence[str] | None = None
) -> DataFrame:
    """Remove rows with missing values (NaN or NULL).

    how="any": drop if any considered column is missing (pandas
    ``dropna()`` default); how="all": drop only when every considered
    column is missing (``dropna(how='all')``).
    """
    if how not in ("any", "all"):
        raise ValueError(f"how must be 'any' or 'all', got {how!r}")
    return df.na.drop(how=how, subset=list(subset) if subset else None)


def require_keys(df: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Keep only rows where every required field is present — the
    reference's pre-ingest contract (required keys ['id','title','body']).

    Unlike the reference (which silently drops bad records inside a
    Python loop), this is a single vectorized predicate Catalyst can
    push into the scan.
    """
    if not keys:
        return df
    pred = F.lit(True)
    for k in keys:
        pred = pred & F.col(k).isNotNull()
    return df.filter(pred)


def impute_group_mean(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    out_col: str | None = None,
) -> DataFrame:
    """Fill missing values with their group's mean — the standard
    imputation step between ``drop_null_rows`` (which discards) and
    model training (which can't eat NULLs): nulls inherit the center
    of their own stratum instead of a global constant.

    Scale shape (same as ``profile.zscore_outliers``): one aggregate
    shuffle computes per-group means — order-independent decimal sums
    (``functions/numeric.py::davg``), so the imputed values are
    bit-identical under any partitioning — then the tiny stats table
    broadcasts back onto the fact side, which never shuffles. Groups
    whose every value is NULL stay NULL (no center to impute from);
    ``n_imputed`` style accounting belongs to the caller via
    ``F.col(value_col).isNull()`` before/after.
    """
    from pipeline_airflow_docker_spark.functions.numeric import davg  # noqa: PLC0415

    groups = list(group_cols)
    if not groups:
        raise ValueError("impute_group_mean needs at least one group column")
    out_col = out_col or value_col
    stats = df.groupBy(*groups).agg(davg(value_col).alias("__grp_mean"))
    return (
        df.join(F.broadcast(stats), on=groups, how="left")
        .withColumn(out_col, F.coalesce(F.col(value_col), F.col("__grp_mean")))
        .drop("__grp_mean")
    )
