"""Airflow orchestration shell over the Spark engine.

BASELINE.json's deployment shape is "Spark jobs orchestrated in
Airflow DAGs": Airflow keeps exactly the role it has in the reference
— scheduling, retries, alerting — while every byte of data moves
through one lazy Spark plan per DAG (``pipelines.py``). The
reference's N-task shape (extract >> transform >> load, each task
re-materializing the whole dataset through ``/tmp`` —
SURVEY.md §3, §4.1) deliberately does NOT survive: a task boundary in
the reference exists to pass data, and Catalyst already pipelines
those stages; keeping them as separate Airflow tasks would just
reintroduce the materialization. What remains task-shaped is what is
genuinely orchestration: the run itself, and the metrics/report step
(reference K8/G5 — XCom counts + templated email).

The module is import-safe without Airflow installed: ``DAG_SPECS`` is
plain data (tested in tests/test_airflow_shell.py), and
``build_all_dags`` constructs real DAG objects only when the
``airflow`` import succeeds (e.g. dropped into a deployment's
``dags/`` folder; the container ships it per the reference's
``Dockerfile`` apache/airflow base).

Schedules, retries and run-concurrency mirror the reference exactly
(citations per spec below; ``max_active_runs=1`` on the enhanced DAG
maps the same invariant Structured Streaming gets from one-query-per-
checkpoint).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from datetime import timedelta
from typing import Any, Callable

from pipeline_airflow_docker_spark import pipelines

#: jsonplaceholder schema — the posts contract the reference validates
#: [ref dags/kafka_to_mongo_pipeline_enchanced.py:41-42].
POSTS_SCHEMA = "userId BIGINT, id BIGINT, title STRING, body STRING"


def _kafka_to_mongo_job(
    spark, bootstrap_servers: str, topic: str, schema: str, collection_path: str
):
    """Deployment adapter for the ``kafka_to_mongo`` replay: bounded
    batch read of the topic (AvailableNow semantics — fixes reference
    bug 3's forever-loop) feeding the decode+append plan."""
    messages = (
        spark.read.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", "earliest")
        .load()
    )
    return pipelines.kafka_to_mongo(spark, messages, schema, collection_path)


def _scrape_job(spark, page_url: str, collection_path: str, max_links: int):
    """Deployment adapter for the scrape replay: fetch the page
    driver-side (the reference scrapes exactly one page) and hand the
    1-row corpus to the distributed scrape plan."""
    import urllib.request  # noqa: PLC0415

    html = (
        urllib.request.urlopen(page_url, timeout=10)
        .read()
        .decode("utf-8", "replace")
    )
    pages = spark.createDataFrame([(page_url, html)], "url STRING, html STRING")
    return pipelines.scrap_to_kafka_to_mongo_pipeline(
        spark, pages, collection_path, max_links
    )


@dataclass(frozen=True)
class DagSpec:
    """One reference DAG re-expressed as (schedule, one Spark job)."""

    dag_id: str
    runner: Callable[..., Any]  # pipelines.py entry; (spark, **params)
    schedule: str | timedelta | None
    retries: int
    retry_delay: timedelta
    ref: str  # reference file this spec mirrors
    params: dict[str, Any] = field(default_factory=dict)
    has_report: bool = False  # reference ends in an email/report task (K8)
    max_active_runs: int | None = None


DAG_SPECS: tuple[DagSpec, ...] = (
    DagSpec(
        "data_extraction",
        pipelines.data_extraction,
        timedelta(days=1),
        1,
        timedelta(minutes=5),
        "dags/data_extraction.py",
        {"csv_path": "{staging}/hw_200.csv"},
    ),
    DagSpec(
        "etl_data_pipeline",
        pipelines.etl_data_pipeline,
        timedelta(days=1),
        1,
        timedelta(minutes=5),
        "dags/etl_data_pipeline.py:50",
        {"csv_path": "{staging}/hw_200.csv", "out_path": "{warehouse}/cleaned_data"},
    ),
    DagSpec(
        "etl_data_pipeline_mongodb",
        pipelines.etl_data_pipeline_mongodb,
        timedelta(days=1),
        1,
        timedelta(minutes=5),
        "dags/etl_data_pipeline_mongodb.py",
        {"csv_path": "{staging}/hw_200.csv", "collection_path": "{warehouse}/docs"},
    ),
    DagSpec(
        "etl_data_pipeline_mongodb_complex",
        pipelines.etl_data_pipeline_mongodb_complex,
        timedelta(days=1),
        1,
        timedelta(minutes=5),  # [ref dags/etl_data_pipeline_mongodb_complex.py:69-70]
        "dags/etl_data_pipeline_mongodb_complex.py",
        {
            "csv_path_1": "{staging}/airtravel.csv",
            "csv_path_2": "{staging}/grades.csv",
            "collection_path": "{warehouse}/combined",
            "min_rows": 10,
        },
        has_report=True,
    ),
    DagSpec(
        "kafka_to_mongo",
        _kafka_to_mongo_job,
        None,  # manual trigger [ref dags/kafka_to_mongo.py]
        1,
        timedelta(minutes=5),
        "dags/kafka_to_mongo.py",
        {
            "bootstrap_servers": "kafka:9092",
            "topic": "my_topic",  # [ref dags/kafka_to_mongo.py:9]
            "schema": POSTS_SCHEMA,
            "collection_path": "{warehouse}/messages",
        },
    ),
    DagSpec(
        "kafka_to_mongo_pipeline",
        pipelines.kafka_to_mongo_pipeline,
        None,  # schedule_interval=None [ref dags/kafka_to_mongo_pipeline.py:32]
        1,
        timedelta(minutes=5),
        "dags/kafka_to_mongo_pipeline.py",
        {
            "api_url": "https://jsonplaceholder.typicode.com/posts",
            "schema": POSTS_SCHEMA,
            "collection_path": "{warehouse}/posts",
            "max_messages": 100,
        },
        has_report=True,
    ),
    DagSpec(
        "kafka_to_mongo_pipeline_enhanced",
        pipelines.kafka_to_mongo_pipeline_enhanced,
        "@daily",  # [ref dags/kafka_to_mongo_pipeline_enchanced.py:201]
        2,
        timedelta(minutes=2),  # [ref dags/kafka_to_mongo_pipeline_enchanced.py:191-192]
        "dags/kafka_to_mongo_pipeline_enchanced.py:191-203",
        {
            "api_url": "https://jsonplaceholder.typicode.com/posts",
            "schema": POSTS_SCHEMA,
            "collection_path": "{warehouse}/posts_enriched",
            "max_messages": 50,
        },
        has_report=True,
        max_active_runs=1,  # [ref :203]
    ),
    DagSpec(
        "scrap_to_kafka_to_mongo_pipeline",
        _scrape_job,
        None,
        1,
        timedelta(minutes=5),
        "dags/scrap_to_kafka_to_mongo_pipeline.py",
        {
            "page_url": "https://example.com",
            "collection_path": "{warehouse}/scraped",
            "max_links": 10,
        },
        has_report=True,
    ),
    DagSpec(
        "data_pipeline_workflow",
        pipelines.data_pipeline_workflow,
        None,
        1,
        timedelta(minutes=5),
        "dags/__pycache__/data_pipeline_workflow.cpython-312.pyc (recovered)",
        {
            "api_url": "https://jsonplaceholder.typicode.com/posts",
            "schema": POSTS_SCHEMA,
            "collection_path": "{warehouse}/workflow_docs",
        },
        has_report=True,
    ),
)


def resolve_params(
    spec: DagSpec, staging: str, warehouse: str
) -> dict[str, Any]:
    """Fill the ``{staging}``/``{warehouse}`` placeholders in a spec."""

    def _fmt(v: Any) -> Any:
        if isinstance(v, str):
            return v.format(staging=staging, warehouse=warehouse)
        if isinstance(v, list):
            return [_fmt(x) for x in v]
        return v

    return {k: _fmt(v) for k, v in spec.params.items()}


def build_all_dags(
    namespace: dict[str, Any],
    staging: str = "/data/staging",
    warehouse: str = "/data/warehouse",
) -> list[Any]:
    """Construct one Airflow DAG per spec into ``namespace`` (call as
    ``build_all_dags(globals())`` from a file in the Airflow dags
    folder). No-op returning [] when Airflow is not installed, so this
    module stays importable inside the engine's own test environment.
    """
    try:  # Airflow exists only in the deployment image
        from airflow import DAG  # noqa: PLC0415
        from airflow.operators.python import PythonOperator  # noqa: PLC0415
    except ImportError:
        return []

    from pipeline_airflow_docker_spark.session import get_spark  # noqa: PLC0415

    dags = []
    for spec in DAG_SPECS:
        with DAG(
            dag_id=spec.dag_id,
            schedule=spec.schedule,
            catchup=False,  # catchup=False everywhere in the reference
            max_active_runs=spec.max_active_runs or 16,
            default_args={
                "retries": spec.retries,
                "retry_delay": spec.retry_delay,
            },
        ) as dag:

            def _run(spec=spec, **_):
                spark = get_spark()
                return spec.runner(
                    spark, **resolve_params(spec, staging, warehouse)
                )

            run = PythonOperator(task_id="run_spark_job", python_callable=_run)

            if spec.has_report:
                # K8 report stage: render the metrics dict the job
                # returned (Airflow auto-XComs the return value) with
                # the engine's report renderer (sinks/report.py) — the
                # engine computes metrics AND formats them; the
                # orchestration layer only schedules the send.
                def _report(ti, spec=spec, **_):
                    from pipeline_airflow_docker_spark.sinks.report import (
                        render_report_html,
                    )

                    metrics = ti.xcom_pull(task_ids="run_spark_job")
                    return render_report_html(
                        metrics or {}, title=spec.dag_id
                    )

                run >> PythonOperator(
                    task_id="send_report", python_callable=_report
                )
        namespace[spec.dag_id] = dag
        dags.append(dag)
    return dags
