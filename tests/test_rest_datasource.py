"""Partitioned REST source (Spark 4 Python Data Source) driven over
file:// URLs — exercises the real executor-side read path without a
network."""

from __future__ import annotations

import json

import pytest

from pipeline_airflow_docker_spark.sources.rest_datasource import (
    RestJsonDataSource,
    register,
)

POSTS_SCHEMA = "userId BIGINT, id BIGINT, title STRING, body STRING"


@pytest.fixture()
def pages_dir(tmp_path):
    for page in (1, 2):
        rows = [
            {"userId": page, "id": page * 10 + i, "title": f"t{page}-{i}", "body": "b"}
            for i in range(3)
        ]
        (tmp_path / f"page{page}.json").write_text(json.dumps(rows))
    return tmp_path


def test_rest_datasource_reads_pages_as_partitions(spark, pages_dir):
    register(spark)
    df = (
        spark.read.format("rest_json")
        .schema(POSTS_SCHEMA)
        .option("url_template", f"file://{pages_dir}/page{{page}}.json")
        .option("pages", "2")
        .load()
    )
    assert df.rdd.getNumPartitions() == 2  # one partition per page
    rows = {r.id for r in df.collect()}
    assert rows == {10, 11, 12, 20, 21, 22}
    assert df.schema.simpleString() == (
        "struct<userId:bigint,id:bigint,title:string,body:string>"
    )


def test_rest_datasource_missing_keys_become_null(spark, tmp_path):
    (tmp_path / "page1.json").write_text(
        json.dumps([{"id": 1, "title": "only"}, {"id": 2, "body": "x"}])
    )
    register(spark)
    df = (
        spark.read.format("rest_json")
        .schema(POSTS_SCHEMA)
        .option("url_template", f"file://{tmp_path}/page{{page}}.json")
        .load()
    )
    rows = {r.id: (r.title, r.body, r.userId) for r in df.collect()}
    assert rows == {1: ("only", None, None), 2: (None, "x", None)}


def test_rest_datasource_requires_schema(spark):
    register(spark)
    reader = spark.read.format("rest_json").option(
        "url_template", "file:///nonexistent/page{page}.json"
    )
    with pytest.raises(Exception, match="explicit .schema"):
        reader.load().collect()


def test_rest_datasource_retries_then_fails(spark, tmp_path):
    register(spark)
    df = (
        spark.read.format("rest_json")
        .schema(POSTS_SCHEMA)
        .option("url_template", f"file://{tmp_path}/absent{{page}}.json")
        .option("max_retries", "2")
        .load()
    )
    with pytest.raises(Exception, match="after 2 attempts"):
        df.collect()


def test_rest_stream_datasource_pages_as_offsets(spark, pages_dir):
    """Streaming variant: page number is the offset. availableNow
    snapshots ONE prefetched read() for a simple stream reader, so the
    end-to-end query covers a single batch; the multi-batch offset
    walk (page advancing, last_page clamp) is asserted directly on the
    reader below."""
    from pyspark.sql.types import StructType

    from pipeline_airflow_docker_spark.sources.rest_datasource import (
        RestJsonStreamReader,
        register_stream,
    )
    from pipeline_airflow_docker_spark.streaming.runner import run_to_df

    register_stream(spark)
    sdf = (
        spark.readStream.format("rest_json_stream")
        .schema(POSTS_SCHEMA)
        .option("url_template", f"file://{pages_dir}/page{{page}}.json")
        .option("first_page", "1")
        .option("last_page", "2")
        .option("pages_per_batch", "2")
        .load()
    )
    out = run_to_df(sdf, output_mode="append")
    rows = {r.id for r in out.collect()}
    assert rows == {10, 11, 12, 20, 21, 22}

    # multi-batch offset walk: one page per read(), clamped at last_page
    reader = RestJsonStreamReader(
        StructType.fromDDL(POSTS_SCHEMA),
        {
            "url_template": f"file://{pages_dir}/page{{page}}.json",
            "first_page": "1",
            "last_page": "2",
        },
    )
    off = reader.initialOffset()
    assert off == {"page": 1}
    batch1, off = reader.read(off)
    assert {r[1] for r in batch1} == {10, 11, 12} and off == {"page": 2}
    batch2, off = reader.read(off)
    assert {r[1] for r in batch2} == {20, 21, 22} and off == {"page": 3}
    batch3, off = reader.read(off)  # past last_page: empty, offset fixed
    assert list(batch3) == [] and off == {"page": 3}
