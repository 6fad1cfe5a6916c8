"""Expression helpers shared by operators and plans."""

from pipeline_airflow_docker_spark.functions.numeric import (  # noqa: F401
    davg,
    dec,
    dsum,
)
