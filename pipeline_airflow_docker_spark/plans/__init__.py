"""Query plan registry — the driver-facing inventory.

Each operator from SURVEY.md §2 registers a named query here: a
``(spark, sf_dir) -> DataFrame`` callable, optionally paired with the
equivalent ANSI SQL the DuckDB oracle runs on the same parquet tables.
``__spark_entry__.py`` is a thin shim over this module.
"""

from __future__ import annotations

from pipeline_airflow_docker_spark.plans.registry import (  # noqa: F401
    ORACLES,
    QUERIES,
    query,
)

# Importing these modules populates the registry.
from pipeline_airflow_docker_spark.plans import (  # noqa: F401,E402
    reference_ops,
    relational,
    llm,
    streaming_q,
)
