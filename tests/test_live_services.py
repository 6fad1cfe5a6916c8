"""Live-service E2E round-trips, gated on environment variables.

The sandbox has no Kafka broker and no MongoDB, so these tests SKIP by
default with a visible reason; pointing the env var at a real service
runs the full produce -> consume (resp. write -> read-back) path
against it. This is the same pattern as the embedded-Derby JDBC
round-trip (plans/reference_ops.py::q_jdbc_roundtrip) — which runs
unconditionally because Derby ships with the JVM — extended to the
two services the reference talks to over the network:

- ``KAFKA_BOOTSTRAP=host:9092`` exercises streaming/kafka.py against
  a real broker [ref producer.py:23-26, consumer.py:12-26]: batch
  write N JSON messages through ``kafka_writer_options``, read them
  back with ``kafka_reader_options`` + ``decode_json_values``.
- ``MONGO_URI=mongodb://host:27017`` exercises the K4/K5 connector
  path in sinks/batch.py [ref dags/etl_data_pipeline_mongodb.py:38]:
  ``append_documents_mongo`` (no parquet fallback — the point is the
  live connector), read back via ``spark.read.format("mongodb")``,
  plus the keyed-upsert idempotency contract (second write of the
  same ids leaves the row count unchanged).

When the env var IS set, a missing connector jar is a FAILURE, not a
skip: the variable asserts the environment is live-capable
(spark-sql-kafka / mongo-spark-connector on the classpath).
"""

from __future__ import annotations

import json
import os
import uuid

import pytest

from pyspark.sql import functions as F

KAFKA = os.environ.get("KAFKA_BOOTSTRAP")
MONGO = os.environ.get("MONGO_URI")


@pytest.mark.skipif(
    not KAFKA,
    reason="no live Kafka broker: set KAFKA_BOOTSTRAP=host:9092 to run",
)
def test_kafka_roundtrip_live(spark):
    from pipeline_airflow_docker_spark.streaming.kafka import (
        KAFKA_SHAPE,
        decode_json_values,
        kafka_reader_options,
        kafka_writer_options,
    )

    topic = f"spark_graft_e2e_{uuid.uuid4().hex[:12]}"
    rows = [(i, f"msg-{i}") for i in range(50)]
    payload = spark.createDataFrame(rows, "event_id LONG, body STRING").select(
        F.col("event_id").cast("string").alias("key"),
        F.to_json(F.struct("event_id", "body")).alias("value"),
    )
    payload.write.format("kafka").options(
        **kafka_writer_options(topic, KAFKA)
    ).save()

    wire = (
        spark.read.format("kafka")
        .options(**kafka_reader_options(KAFKA, topic))
        .load()
    )
    # The batch reader carries the same wire columns the streaming
    # contract declares.
    wire_cols = {f.split()[0] for f in KAFKA_SHAPE.split(", ")}
    assert wire_cols <= set(wire.columns)

    got = decode_json_values(wire, "event_id LONG, body STRING", keep_meta=True)
    back = {r.event_id: r.body for r in got.collect()}
    assert back == dict(rows)
    # offsets are per-partition; a broker that auto-creates multi-
    # partition topics restarts them at 0 per partition, so the
    # delivery key is (partition, offset), never offset alone.
    assert got.select("partition", "offset").distinct().count() == len(rows)


@pytest.mark.skipif(
    not MONGO,
    reason="no live MongoDB: set MONGO_URI=mongodb://host:27017 to run",
)
def test_mongo_append_and_upsert_live(spark):
    from pipeline_airflow_docker_spark.sinks.batch import (
        append_documents_mongo,
        mongo_writer_options,
    )

    db, coll = "spark_graft_e2e", f"docs_{uuid.uuid4().hex[:12]}"
    df = spark.createDataFrame(
        [(i, f"text-{i}") for i in range(25)], "doc_id LONG, text STRING"
    )

    # K5 bulk append through the live connector (no fallback allowed).
    # id_cols on the FIRST write too: _id must be doc_id-derived from
    # the start, or the later keyed upsert matches nothing (documents
    # written without idFieldList get connector-generated ObjectIds).
    assert append_documents_mongo(df, MONGO, db, coll, id_cols=["doc_id"]) == "mongodb"
    read_opts = mongo_writer_options(MONGO, db, coll)
    back = (
        spark.read.format("mongodb")
        .options(**{k: read_opts[k] for k in ("connection.uri", "database", "collection")})
        .load()
    )
    assert back.count() == 25

    # K4 keyed upsert: re-writing the same ids must not grow the
    # collection (idempotent delivery, ref enhanced consumer's
    # update_one(..., upsert=True)).
    updated = df.withColumn("text", F.concat(F.col("text"), F.lit("-v2")))
    assert append_documents_mongo(updated, MONGO, db, coll, id_cols=["doc_id"]) == "mongodb"
    back2 = (
        spark.read.format("mongodb")
        .options(**{k: read_opts[k] for k in ("connection.uri", "database", "collection")})
        .load()
    )
    assert back2.count() == 25
    assert {
        json.loads(r)["text"] for r in back2.toJSON().collect()
    } == {f"text-{i}-v2" for i in range(25)}
