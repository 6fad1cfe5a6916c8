"""Enrichment / reshaping operators.

Reference behaviors re-expressed (citations into /root/reference/):
- ``enrich_data``    -> enrich           [dags/kafka_to_mongo_pipeline_enchanced.py:65-80]
- pyc-DAG nest wrap  -> nest_struct      [dags/__pycache__/data_pipeline_workflow pyc, consts
                                          ('original_data','processed_at','status')]
- JSON (de)serialize -> json_serialize / json_deserialize
                                         [producer.py:8, consumer.py:17]

The reference stamps records with ``datetime.now().isoformat()`` (and
in fact crashes on a missing import doing so — SURVEY.md §0 bug 1).
``enrich`` defaults to ``current_timestamp()``; pass ``ts`` to derive a
deterministic timestamp from data instead (required for replayable /
oracle-checkable pipelines).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

ISO_FMT = "yyyy-MM-dd'T'HH:mm:ss"


def enrich(
    df: DataFrame,
    source: str,
    status: str = "raw",
    ts: Column | None = None,
    iso_string: bool = True,
) -> DataFrame:
    """Append provenance columns: processed_timestamp, source, data_status.

    ``ts`` — timestamp expression to stamp with; defaults to
    ``current_timestamp()`` (wall clock, like the reference intended).
    ``iso_string=True`` emits the ISO-8601 *string* form the reference
    produced via ``.isoformat()``.
    """
    stamp = ts if ts is not None else F.current_timestamp()
    if iso_string:
        stamp = F.date_format(stamp, ISO_FMT)
    return (
        df.withColumn("processed_timestamp", stamp)
        .withColumn("source", F.lit(source))
        .withColumn("data_status", F.lit(status))
    )


def nest_struct(
    df: DataFrame,
    wrapper: str = "original_data",
    status: str = "processed",
    ts: Column | None = None,
) -> DataFrame:
    """Wrap every input column into one struct + metadata columns —
    the pyc-only DAG's ``{original_data, processed_at, status}`` shape,
    the reference's only nested type (FIXTURES.md §2.3)."""
    stamp = ts if ts is not None else F.current_timestamp()
    return df.select(
        F.struct(*[F.col(c) for c in df.columns]).alias(wrapper),
        F.date_format(stamp, ISO_FMT).alias("processed_at"),
        F.lit(status).alias("status"),
    )


def json_serialize(df: DataFrame, out_col: str = "value") -> DataFrame:
    """All columns -> one JSON string column (Kafka producer value
    shape). JVM-side ``to_json``, not a per-record Python lambda."""
    return df.select(F.to_json(F.struct(*[F.col(c) for c in df.columns])).alias(out_col))


def json_deserialize(df: DataFrame, schema: StructType, in_col: str = "value") -> DataFrame:
    """One JSON string column -> typed columns. Explicit schema +
    PERMISSIVE mode: corrupt records become nulls instead of the
    reference's crash-on-bad-record behavior."""
    return df.select(F.from_json(F.col(in_col), schema).alias("r")).select("r.*")
