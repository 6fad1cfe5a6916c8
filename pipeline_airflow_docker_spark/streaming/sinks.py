"""Idempotent streaming sinks.

K3 (the reference's single most important semantic, SURVEY.md §2
A.6): ``update_one({'id': ...}, {'$set': ...}, upsert=True)`` at
dags/kafka_to_mongo_pipeline_enchanced.py:141-145 — keyed
last-writer-wins upsert that turns at-least-once delivery into
effectively-exactly-once.

The Spark form is ``foreachBatch`` + merge-by-key. Determinism
upgrade over the reference: the reference's "last writer" is arrival
order (racy); here the winner is max over an explicit version column,
so replays and batch re-executions converge to the same table.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def latest_by_key(df: DataFrame, keys: list[str], version_cols: list[str]) -> DataFrame:
    """Deterministic last-writer-wins: keep the row with the maximal
    (version_cols) tuple per key."""
    order = [F.col(c).desc() for c in version_cols]
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def upsert_foreach_batch(target_dir: str, keys: list[str], version_cols: list[str]):
    """foreachBatch body: merge each micro-batch into a parquet target
    keyed on ``keys``. Re-running a batch (task retry, checkpoint
    replay) is a no-op — the merge is idempotent.

    On a lakehouse this is Delta ``MERGE INTO``; plain parquet
    rewrite keeps the harness dependency-free. The merge itself is a
    union + windowed keep-max — one shuffle on the keys."""

    def apply(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        merged = latest_by_key(batch, keys, version_cols)
        if os.path.isdir(target_dir) and any(
            f.endswith(".parquet") for f in os.listdir(target_dir)
        ):
            existing = spark.read.parquet(target_dir)
            merged = latest_by_key(
                existing.unionByName(merged), keys, version_cols
            )
        # Stage-then-swap: foreachBatch may re-run after failure, and a
        # partially overwritten target must never be read back as state.
        tmp = target_dir.rstrip("/") + f".tmp_{batch_id}"
        merged.write.mode("overwrite").parquet(tmp)
        final = spark.read.parquet(tmp)
        final.write.mode("overwrite").parquet(target_dir)

    return apply


def mongo_upsert_foreach_batch(
    uri: str,
    database: str,
    collection: str,
    keys: list[str],
    version_cols: list[str],
    fallback_dir: str | None = None,
):
    """foreachBatch body for the reference's streaming kafka->mongo
    tail [ref dags/kafka_to_mongo_pipeline_enchanced.py:141-145
    ``update_one(..., upsert=True)`` per message]: dedup the
    micro-batch to its per-key winners, then bulk-upsert through the
    MongoDB Spark connector (``idFieldList`` = keys), which makes
    checkpoint replays idempotent server-side. Without the connector
    jar, falls back to the parquet merge sink (``upsert_foreach_batch``)
    so the pipeline stays runnable — same keyed last-writer-wins
    contract either way.
    """
    from pipeline_airflow_docker_spark.sinks.batch import (  # noqa: PLC0415
        append_documents_mongo,
        mongo_connector_absent,
    )

    def apply(batch: DataFrame, batch_id: int) -> None:
        merged = latest_by_key(batch, keys, version_cols)
        try:
            append_documents_mongo(merged, uri, database, collection, id_cols=keys)
        except Exception as exc:  # noqa: BLE001 — connector-absence only
            if not mongo_connector_absent(exc) or fallback_dir is None:
                raise
            upsert_foreach_batch(fallback_dir, keys, version_cols)(merged, batch_id)

    return apply
