"""Data-quality gates / pipeline control-flow operators.

Reference behavior re-expressed: the count-threshold branch — run the
load only when the cleaned row count exceeds a minimum, else skip
[/root/reference/dags/etl_data_pipeline_mongodb_complex.py:57-62,113-126].
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def count_gate(df: DataFrame, min_rows: int) -> DataFrame:
    """Return ``df`` unchanged when it holds more than ``min_rows``
    rows, else an empty frame with the same schema (the "skip" branch).

    The count is a deliberate driver-side action — it IS the branch
    decision, mirroring Airflow's BranchPythonOperator. The count plan
    itself is cheap at any scale (column-pruned scan + partial counts).
    """
    n = df.count()
    return df if n > min_rows else df.limit(0)
