"""Kafka source/sink recipes (SURVEY.md §2 S6-S8, K7).

The reference consumes Kafka three ways, all per-record Python loops:

- S6 unbounded, from earliest, auto-commit   [ref consumer.py:12-18;
  dags/kafka_to_mongo.py:13,17-19 — loops forever, task never ends]
- S7 bounded poll: stop after N messages     [ref dags/kafka_to_mongo_pipeline.py:55-82]
- S8 consumer group, at-least-once, bounded  [ref dags/kafka_to_mongo_pipeline_enchanced.py:129-150]

Spark mapping (this module): one ``readStream.format("kafka")`` builder
per mode. The poll loop becomes trigger policy (``availableNow`` +
``maxOffsetsPerTrigger``); the consumer group's offset tracking becomes
the checkpoint (Spark tracks its own offsets — Kafka group commits are
not the source of truth); "forever" becomes a supervised continuous
trigger, which actually terminates on stop() unlike the reference's
bug-3 infinite loop.

No broker exists in the test harness, so builders are exercised up to
option construction; the value-decode transform (the part with real
semantics) is tested on synthetic Kafka-shaped frames, and the
end-to-end stateful paths run over the file-source stand-in
(``sources.stream_table``) which shares every downstream operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import DataStreamReader
from pyspark.sql.types import StructType

# Columns every Kafka source row carries (the wire contract the decode
# transform consumes).
KAFKA_SHAPE = (
    "key BINARY, value BINARY, topic STRING, partition INT, offset BIGINT, "
    "timestamp TIMESTAMP, timestampType INT"
)


def kafka_reader_options(
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = None,
    fail_on_data_loss: bool = False,
) -> dict[str, str]:
    """Source options for the three reference consumption modes.

    S6 shape: defaults — subscribe from earliest, no rate cap.
    S7 shape: ``max_offsets_per_trigger=N`` + run the query with
    ``Trigger.AvailableNow`` — bounded micro-batches that *terminate*,
    replacing the reference's poll-until-100 loop (and its spin-forever
    bug when the topic holds fewer messages).
    S8 shape: same options + a stable ``checkpointLocation`` on the
    writer — restart-safe progress without Kafka group commits
    (``group_id='airflow_consumer_group'`` becomes the checkpoint dir).
    """
    opts = {
        "kafka.bootstrap.servers": bootstrap_servers,
        "subscribe": topic,
        "startingOffsets": starting_offsets,
        "failOnDataLoss": str(fail_on_data_loss).lower(),
    }
    if max_offsets_per_trigger is not None:
        opts["maxOffsetsPerTrigger"] = str(max_offsets_per_trigger)
    return opts


def kafka_reader(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    **kwargs,
) -> DataStreamReader:
    """Configured Kafka stream reader (caller ``.load()``s it).
    See ``kafka_reader_options`` for the mode mapping."""
    return spark.readStream.format("kafka").options(
        **kafka_reader_options(bootstrap_servers, topic, **kwargs)
    )


def decode_json_values(
    kafka_df: DataFrame,
    schema: StructType | str,
    keep_meta: bool = False,
) -> DataFrame:
    """Kafka wire rows -> typed columns.

    The reference's per-message ``json.loads`` deserializer lambdas
    [ref consumer.py:17; dags/kafka_to_mongo_pipeline.py:59] as one
    JVM-side expression: ``value`` bytes -> string (P8 byte decode,
    ref dags/kafka_to_mongo.py:18) -> ``from_json`` with explicit
    schema, PERMISSIVE: malformed payloads surface as a null struct
    (dropped or quarantined by the caller) instead of the reference's
    crash-on-first-bad-record.

    ``keep_meta=True`` retains (topic, partition, offset, timestamp) —
    the columns an idempotent sink needs to build a delivery key.
    """
    parsed = F.from_json(F.col("value").cast("string"), schema).alias("r")
    if keep_meta:
        return kafka_df.select(
            parsed, "topic", "partition", "offset", "timestamp"
        ).select("r.*", "topic", "partition", "offset", "timestamp")
    return kafka_df.select(parsed).select("r.*")


def kafka_writer_options(topic: str, bootstrap_servers: str) -> dict[str, str]:
    """K7 sink options for ``writeStream.format("kafka")`` /
    ``write.format("kafka")``; payload framing is
    ``sinks.kafka_payload`` (JVM-side ``to_json(struct(*))``)."""
    return {
        "kafka.bootstrap.servers": bootstrap_servers,
        "topic": topic,
    }
