"""Set-combination operators.

Reference behavior re-expressed: the ragged concat
``pd.concat([df1, df2], ignore_index=True)`` of two frames sharing *no*
columns (airtravel ⊎ grades), where missing cells become null
[/root/reference/dags/etl_data_pipeline_mongodb_complex.py:31].

Positional ``union()`` would be a correctness bug here (SURVEY.md
§4.2); ``unionByName(allowMissingColumns=True)`` is the faithful
mapping and preserves pandas' result column order (left frame's
columns, then the right frame's new columns).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame


def union_ragged(*dfs: DataFrame) -> DataFrame:
    """Schema-aligning UNION ALL of frames with arbitrary column overlap."""
    if not dfs:
        raise ValueError("union_ragged needs at least one DataFrame")
    return reduce(lambda a, b: a.unionByName(b, allowMissingColumns=True), dfs)
