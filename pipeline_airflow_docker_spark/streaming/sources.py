"""Streaming sources.

The harness has no Kafka broker (SURVEY.md §7 Phase 3), so the
reference's Kafka topics are modeled by the *file* source over staged
parquet — the same unbounded-source API surface (``spark.readStream``),
schema-first like the Kafka ``from_json(value)`` path would be. A real
deployment swaps ``stream_table`` for
``spark.readStream.format("kafka")...`` + ``from_json``; every
downstream operator is source-agnostic.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession

from pipeline_airflow_docker_spark.catalog import table

_STAGED: dict[tuple[str, str, int], str] = {}


def stage_table(
    spark: SparkSession, sf_dir: str, name: str, n_files: int = 1
) -> str:
    """Materialize a test table as a directory of parquet files the
    file source can monitor. ``n_files > 1`` + maxFilesPerTrigger
    yields genuine multi-micro-batch runs (state crossing batches).
    Staged once per (sf_dir, table, n_files) per process."""
    key = (sf_dir, name, n_files)
    if key not in _STAGED or not os.path.isdir(_STAGED[key]):
        out = os.path.join(
            tempfile.mkdtemp(prefix=f"padspark_stream_{name}_"), "data"
        )
        df = table(spark, sf_dir, name)
        if n_files > 1:
            # Time-ordered split: file i holds an ordered slice, so a
            # maxFilesPerTrigger=1 run sees broadly in-order batches
            # (how a replayed Kafka topic would arrive).
            df = df.repartitionByRange(n_files, *df.columns[:1])
        else:
            df = df.coalesce(1)
        df.write.mode("overwrite").parquet(out)
        _STAGED[key] = out
    return _STAGED[key]


def stream_table(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    n_files: int = 1,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Unbounded DataFrame over a staged test table: the engine's
    stand-in for a Kafka topic subscription."""
    path = stage_table(spark, sf_dir, name, n_files)
    schema = spark.read.parquet(path).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)
