"""Bounded streaming execution: run an unbounded plan to completion
under ``Trigger.AvailableNow`` and hand back the result as a batch
DataFrame.

This is the engine's replacement for the reference's bounded poll
loops (``max_messages=100`` at dags/kafka_to_mongo_pipeline.py:69-80,
50 at ..._enchanced.py:148-150): process exactly what the source holds
now, checkpointed, then stop — at-least-once from the source, made
effectively-exactly-once by idempotent sinks (sinks.py).
"""

from __future__ import annotations

import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession


def run_to_df(
    sdf: DataFrame,
    output_mode: str = "complete",
    foreach_batch=None,
    timeout_sec: int = 300,
) -> DataFrame:
    """Execute a streaming DataFrame with availableNow; results land in
    a memory sink (or a foreachBatch sink) and come back as a batch
    DataFrame.

    ``complete`` mode for aggregations: under availableNow the final
    state flushes at end-of-stream without needing the watermark to
    pass the last window (append mode would hold the tail windows in
    state forever on a bounded run)."""
    spark: SparkSession = sdf.sparkSession
    name = f"stream_out_{uuid.uuid4().hex[:12]}"
    ckpt = tempfile.mkdtemp(prefix="padspark_ckpt_")
    writer = sdf.writeStream.trigger(availableNow=True).option(
        "checkpointLocation", ckpt
    )
    if foreach_batch is not None:
        q = writer.outputMode(output_mode).foreachBatch(foreach_batch).start()
        q.awaitTermination(timeout_sec)
        return spark.createDataFrame([], sdf.schema)
    q = writer.outputMode(output_mode).format("memory").queryName(name).start()
    q.awaitTermination(timeout_sec)
    return spark.table(name)
