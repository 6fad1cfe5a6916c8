"""Kafka source/sink recipes (streaming/kafka.py) — no broker in the
harness, so: option construction for the three reference consumption
modes (S6-S8), and the value-decode transform on synthetic wire rows."""

from __future__ import annotations

import json
from datetime import datetime

from pipeline_airflow_docker_spark.streaming.kafka import (
    KAFKA_SHAPE,
    decode_json_values,
    kafka_reader,
    kafka_reader_options,
    kafka_writer_options,
)

POSTS_SCHEMA = "userId BIGINT, id BIGINT, title STRING, body STRING"


def _wire_rows(spark, payloads):
    now = datetime(2024, 1, 1)
    rows = [
        (None, json.dumps(p).encode() if isinstance(p, dict) else p,
         "bigdata_topic", 0, i, now, 0)
        for i, p in enumerate(payloads)
    ]
    return spark.createDataFrame(rows, KAFKA_SHAPE)


def test_kafka_reader_builds_bounded_and_unbounded(spark):
    opts = kafka_reader_options("kafka:9092", "bigdata_topic")
    assert opts["subscribe"] == "bigdata_topic"
    assert opts["startingOffsets"] == "earliest"  # S6 (ref consumer.py:14)
    assert "maxOffsetsPerTrigger" not in opts

    bounded = kafka_reader_options("kafka:9092", "bigdata_topic",
                                   max_offsets_per_trigger=100)  # S7 (ref :69)
    assert bounded["maxOffsetsPerTrigger"] == "100"

    # builder accepts the options without touching a broker
    assert kafka_reader(spark, "kafka:9092", "bigdata_topic") is not None


def test_decode_json_values_typed_and_permissive(spark):
    good = {"userId": 1, "id": 7, "title": "alpha", "body": "b"}
    wire = _wire_rows(spark, [good, b"not json at all"])
    decoded = decode_json_values(wire, POSTS_SCHEMA)
    rows = decoded.collect()
    assert decoded.columns == ["userId", "id", "title", "body"]
    ok = [r for r in rows if r["id"] is not None]
    assert len(rows) == 2 and len(ok) == 1 and ok[0]["title"] == "alpha"

    with_meta = decode_json_values(wire, POSTS_SCHEMA, keep_meta=True)
    assert with_meta.columns[-4:] == ["topic", "partition", "offset", "timestamp"]
    # (topic, partition, offset) is the delivery key an idempotent
    # sink dedups on across micro-batch re-executions
    assert {r["offset"] for r in with_meta.collect()} == {0, 1}


def test_kafka_writer_options():
    assert kafka_writer_options("out_topic", "kafka:9092") == {
        "kafka.bootstrap.servers": "kafka:9092",
        "topic": "out_topic",
    }
