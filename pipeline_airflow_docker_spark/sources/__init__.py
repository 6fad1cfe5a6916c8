"""Batch sources (SURVEY.md §2 A.1).

Every way the reference acquires data, re-expressed so the result is a
DataFrame scan Catalyst can push into:

- S1 HTTP fetch-to-staging  [ref dags/etl_data_pipeline.py:9-14]
- S2 CSV scan               [ref dags/etl_data_pipeline.py:18]
- S3 JSON-records scan      [ref dags/etl_data_pipeline_mongodb.py:35]
- S4 REST JSON API scan     [ref producer.py:12-20;
                             dags/kafka_to_mongo_pipeline_enchanced.py:44-63]
- S5 HTML scrape source     [ref dags/scrap_to_kafka_to_mongo_pipeline.py:40-79]

Streaming sources (S6-S8 Kafka shapes) live in ``..streaming.sources``.
The FileSensor (S9) is orchestration, not data plane (SURVEY.md §2 A.1).

Scale stance: at 100 TB inputs are already in object storage as
partitioned Parquet — the fetch helpers here are the *edge* ingestion
path (small API/scrape payloads), and they normalize immediately into
DataFrames so everything downstream is one lazy plan.
"""

from pipeline_airflow_docker_spark.sources.batch import (  # noqa: F401
    fetch_url_to_staging,
    read_csv,
    read_json_records,
    read_rest_json,
)
from pipeline_airflow_docker_spark.sources.rest_datasource import (  # noqa: F401
    RestJsonDataSource,
)
from pipeline_airflow_docker_spark.sources.scrape import (  # noqa: F401
    extract_html_elements,
    scrape_records,
)
