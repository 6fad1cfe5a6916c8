"""Batch sinks (SURVEY.md §2 A.6).

- K1 CSV write             [ref dags/etl_data_pipeline.py:24]
- K2 JSON-records write    [ref dags/etl_data_pipeline_mongodb.py:24]
- K3 keyed upsert          [ref dags/kafka_to_mongo_pipeline_enchanced.py:141-145]
  (batch form in ``..operators.upsert``; streaming form in
  ``..streaming.sinks`` — re-exported here)
- K4/K5 document append    [ref consumer.py:25; dags/etl_data_pipeline_mongodb.py:38]
- K6 JDBC table replace    [ref dags/etl_data_pipeline.py:32-34]
- K7 Kafka sink            [ref producer.py:23-26]
- partitioned Parquet layout (Phase 5 scale helper — not in the
  reference, which has no partitioning at all, SURVEY.md §4.1)

- K8 email/report sink     [ref dags/kafka_to_mongo_pipeline_enchanced.py:167-183,219-224]
  (``report.py`` — HTML rendering from the G5 metrics table + SMTP
  send; metrics computation itself is G5 / ``pipelines.run_metrics``)
"""

from pipeline_airflow_docker_spark.sinks.batch import (  # noqa: F401
    append_documents,
    kafka_payload,
    write_csv,
    write_jdbc_replace,
    write_json_records,
    write_bucketed,
    write_kafka,
    write_parquet_partitioned,
)
from pipeline_airflow_docker_spark.streaming.sinks import (  # noqa: F401
    latest_by_key as upsert_compact,
)
from pipeline_airflow_docker_spark.streaming.sinks import (  # noqa: F401
    upsert_foreach_batch,
)
from pipeline_airflow_docker_spark.sinks.report import (  # noqa: F401
    render_report_html,
    send_email_report,
)
