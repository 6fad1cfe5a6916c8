"""Structured Streaming layer (SURVEY.md §2 streaming closure).

Re-expresses the reference's Kafka->transform->Mongo pipelines
(S6-S8, K3/K4 — producer.py / consumer.py /
dags/kafka_to_mongo_pipeline*.py) as Structured Streaming: bounded
ingestion via Trigger.AvailableNow replaces the reference's poll loops
(fixing its unbounded-consumption bugs, SURVEY.md §0 bug 3), windowed
stateful aggregation replaces per-message Python, and foreachBatch
keyed upsert reproduces the Mongo ``update_one(upsert=True)``
last-writer-wins semantics idempotently.
"""

from pipeline_airflow_docker_spark.streaming.sources import stream_table  # noqa: F401
from pipeline_airflow_docker_spark.streaming.runner import run_to_df  # noqa: F401
from pipeline_airflow_docker_spark.streaming.sinks import upsert_foreach_batch  # noqa: F401
