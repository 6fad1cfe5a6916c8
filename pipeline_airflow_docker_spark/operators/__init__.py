"""Composable DataFrame -> DataFrame operators.

Each module re-expresses a family of reference capabilities
(SURVEY.md §2 Part A) or an ``[EXT]`` extension family (Parts B/C) as
pure declarative transformations, so Catalyst can fuse whole pipelines
into single physical plans (the reference materialized every stage to
/tmp between tasks — SURVEY.md §4.1).
"""

from pipeline_airflow_docker_spark.operators.cleaning import (  # noqa: F401
    drop_null_rows,
    require_keys,
)
from pipeline_airflow_docker_spark.operators.enrich import (  # noqa: F401
    enrich,
    json_deserialize,
    json_serialize,
    nest_struct,
)
from pipeline_airflow_docker_spark.operators.combine import union_ragged  # noqa: F401
from pipeline_airflow_docker_spark.operators.upsert import latest_by_key  # noqa: F401
