"""The Airflow shell (airflow_dags/engine_dags.py) must be importable
and structurally sound WITHOUT Airflow installed — specs are plain
data; DAG construction is deployment-only."""

from __future__ import annotations

import inspect

from airflow_dags.engine_dags import (
    DAG_SPECS,
    build_all_dags,
    resolve_params,
)
from pipeline_airflow_docker_spark import pipelines

REFERENCE_DAG_IDS = {
    # one spec per reference DAG, incl. the pyc-only recovered one
    "data_extraction",
    "etl_data_pipeline",
    "etl_data_pipeline_mongodb",
    "etl_data_pipeline_mongodb_complex",
    "kafka_to_mongo",
    "kafka_to_mongo_pipeline",
    "kafka_to_mongo_pipeline_enhanced",
    "scrap_to_kafka_to_mongo_pipeline",
    "data_pipeline_workflow",
}


def test_one_spec_per_reference_dag():
    assert {s.dag_id for s in DAG_SPECS} == REFERENCE_DAG_IDS


def test_spec_params_match_runner_signatures():
    """Every spec's params must bind against its runner (spark plus
    params fills all required args) — catches drift between the shell
    and pipelines.py without running anything."""
    for spec in DAG_SPECS:
        sig = inspect.signature(spec.runner)
        params = resolve_params(spec, "/staging", "/warehouse")
        sig.bind("SPARK", **params)  # raises TypeError on mismatch
        for v in params.values():
            assert "{" not in str(v), f"unresolved placeholder in {spec.dag_id}: {v}"


def test_reference_schedule_semantics_preserved():
    by_id = {s.dag_id: s for s in DAG_SPECS}
    # @daily + max_active_runs=1 [ref kafka_to_mongo_pipeline_enchanced.py:201,203]
    enhanced = by_id["kafka_to_mongo_pipeline_enhanced"]
    assert enhanced.schedule == "@daily" and enhanced.max_active_runs == 1
    # manual-only DAGs stay manual [ref kafka_to_mongo_pipeline.py:32]
    assert by_id["kafka_to_mongo_pipeline"].schedule is None
    # report stage only where the reference sends email (K8)
    assert by_id["kafka_to_mongo_pipeline"].has_report
    assert not by_id["etl_data_pipeline"].has_report


def test_build_all_dags_is_noop_without_airflow():
    ns: dict = {}
    assert build_all_dags(ns) == []
    assert ns == {}


def test_runners_are_engine_functions():
    """Adapters aside, every runner resolves into pipelines.py — the
    shell must never contain data logic of its own."""
    direct = {s.runner for s in DAG_SPECS if s.runner.__module__ == pipelines.__name__}
    assert len(direct) >= 7
