"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over ``pipeline_airflow_docker_spark.plans`` — the engine's
query registry. The driver's verify runs ``entry(spark)`` as a smoke
check, runs each ``queries()[name]`` at sf=0.01 and compares it against
the matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# Make the package importable regardless of the driver's CWD.
_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from pipeline_airflow_docker_spark import plans  # noqa: E402
from pipeline_airflow_docker_spark.session import apply_runtime_conf  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (pricing summary over lineitem) on sf0.001."""
    apply_runtime_conf(spark)
    return plans.QUERIES["q_agg_group"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""

    def _wrap(fn):
        def runner(spark: SparkSession, sf_dir: str) -> DataFrame:
            apply_runtime_conf(spark)
            return fn(spark, sf_dir)

        runner.__name__ = fn.__name__
        return runner

    return {name: _wrap(fn) for name, fn in plans.QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per qkey (omitted => rows-only check)."""
    return dict(plans.ORACLES)
