"""Keyed-upsert semantics (the reference's most important operator).

Reference behavior: ``update_one({'id': id}, {'$set': doc}, upsert=True)``
per message [/root/reference/dags/kafka_to_mongo_pipeline_enchanced.py:141-145]
— last-writer-wins dedup by key that turns at-least-once delivery into
effectively exactly-once.

Batch form here: ``latest_by_key`` keeps exactly one row per key, the
one greatest by ``order_by`` (then ``tiebreak`` for full determinism).
This is a single window + filter: one shuffle on the key, no driver
round-trips. The streaming form (micro-batch ``foreachBatch`` keyed
replace) lives in ``streaming/sinks.py``.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def latest_by_key(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[str],
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Keep the last-written row per key.

    ``order_by``/``tiebreak`` columns are ordered DESC — the max wins,
    matching "the latest update replaces the document". At scale this
    is the standard compact-by-key pattern: shuffle on ``keys`` once;
    skewed hot keys are split by AQE skew handling.
    """
    w = Window.partitionBy(*keys).orderBy(
        *[F.col(c).desc() for c in (*order_by, *tiebreak)]
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
