"""Partitioned REST API source via the Spark 4 Python Data Source API.

``sources.batch.read_rest_json`` is the honest mapping for the
reference's single driver-sized page [ref producer.py:12-20;
dags/kafka_to_mongo_pipeline.py:38-48]. This module is the scale path
that SURVEY.md §2 S4 points at: one ``InputPartition`` per API page,
fetched ON THE EXECUTORS in parallel — the driver never sees payload
bytes, so a million-page keyspace reads like any other partitioned
scan and composes with the rest of the plan lazily.

The reference's retry loop [ref dags/kafka_to_mongo_pipeline_enchanced
.py:44-63 — 3 attempts, 10 s timeout] runs per partition, which is
also where it belongs at scale: a flaky page retries alone instead of
failing the whole fetch (plus Spark's own task retry on top).

Usage::

    spark.dataSource.register(RestJsonDataSource)
    df = (spark.read.format("rest_json")
          .schema("userId BIGINT, id BIGINT, title STRING, body STRING")
          .option("url_template", "https://api.example.com/posts?_page={page}")
          .option("pages", "10")
          .load())

Options:
  url_template  URL with a ``{page}`` placeholder (required; a literal
                URL without the placeholder = single partition).
  pages         number of pages / partitions (default 1).
  first_page    page number of the first page (default 1).
  timeout       per-request seconds (default 10).
  max_retries   attempts per page (default 3).

Tests drive it over ``file://`` URLs — same code path, no network.
"""

from __future__ import annotations

import json
from typing import TYPE_CHECKING, Any, Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql import SparkSession


class _PagePartition(InputPartition):
    def __init__(self, page: int):
        self.page = page


def _fetch_page(url: str, timeout: float, max_retries: int) -> list[dict[str, Any]]:
    import urllib.request  # local import: runs inside executor workers

    last_err: Exception | None = None
    for _ in range(max_retries):
        try:
            with urllib.request.urlopen(url, timeout=timeout) as resp:
                body = resp.read()
            rows = json.loads(body.decode("utf-8"))
            break
        except Exception as exc:  # retry transient fetch/parse failures
            last_err = exc
    else:
        raise OSError(
            f"fetch failed after {max_retries} attempts: {url}"
        ) from last_err
    if isinstance(rows, dict):  # single-object endpoint
        rows = [rows]
    return rows


_CASTS = {
    "long": int,
    "integer": int,
    "short": int,
    "byte": int,
    "double": float,
    "float": float,
    "string": str,
    "boolean": bool,
}


class RestJsonReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict[str, str]):
        self._schema = schema
        self._url_template = options["url_template"]
        self._pages = int(options.get("pages", "1"))
        self._first_page = int(options.get("first_page", "1"))
        self._timeout = float(options.get("timeout", "10"))
        self._max_retries = int(options.get("max_retries", "3"))

    def partitions(self) -> list[InputPartition]:
        return [
            _PagePartition(self._first_page + i) for i in range(self._pages)
        ]

    def read(self, partition: _PagePartition) -> Iterator[tuple]:
        url = self._url_template.format(page=partition.page)
        fields = [(f.name, _CASTS.get(f.dataType.typeName())) for f in self._schema]
        for rec in _fetch_page(url, self._timeout, self._max_retries):
            out = []
            for name, cast in fields:
                v = rec.get(name)
                out.append(cast(v) if v is not None and cast else v)
            yield tuple(out)


class RestJsonDataSource(DataSource):
    """``spark.read.format("rest_json")`` — see module docstring."""

    @classmethod
    def name(cls) -> str:
        return "rest_json"

    def schema(self) -> str:
        raise NotImplementedError(
            "rest_json requires an explicit .schema(...): schema-on-read "
            "inference from a remote payload reproduces the reference's "
            "crash-on-bad-record behavior (SURVEY.md §1.3)."
        )

    def reader(self, schema: StructType) -> RestJsonReader:
        return RestJsonReader(schema, dict(self.options))


def register(spark: "SparkSession") -> None:
    spark.dataSource.register(RestJsonDataSource)


# --------------------------------------------------------------------
# Streaming variant: the S6/S7 "poll an offset-paged feed forever"
# shape [ref consumer.py:12-18 endless KafkaConsumer iteration; the
# REST feed analog is an offset-paginated endpoint] as a Spark 4
# Python STREAMING data source. Offsets are page numbers: each
# micro-batch reads pages [start, end) and commits, so checkpoint
# recovery replays exactly the uncommitted pages — the consumer-group
# offset model (S8) without a broker. SimpleDataSourceStreamReader is
# the driver-side prefetch variant (right for one-page-per-batch
# feeds; a partitioned DataSourceStreamReader is the same code split
# across executors once page throughput demands it).
# --------------------------------------------------------------------


class RestJsonStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, schema: StructType, options: dict[str, str]):
        self._schema = schema
        self._url_template = options["url_template"]
        self._first_page = int(options.get("first_page", "1"))
        self._last_page = int(options.get("last_page", "0"))  # 0 = endless
        self._pages_per_batch = int(options.get("pages_per_batch", "1"))
        self._timeout = float(options.get("timeout", "10"))
        self._max_retries = int(options.get("max_retries", "3"))

    def initialOffset(self) -> dict:
        return {"page": self._first_page}

    def read(self, start: dict) -> tuple:
        lo = int(start["page"])
        hi = lo + self._pages_per_batch
        if self._last_page:
            hi = min(hi, self._last_page + 1)
        fields = [(f.name, _CASTS.get(f.dataType.typeName())) for f in self._schema]
        rows: list[tuple] = []
        for page in range(lo, hi):
            for rec in _fetch_page(
                self._url_template.format(page=page),
                self._timeout,
                self._max_retries,
            ):
                rows.append(
                    tuple(
                        (cast(rec.get(name)) if rec.get(name) is not None and cast
                         else rec.get(name))
                        for name, cast in fields
                    )
                )
        return iter(rows), {"page": max(hi, lo)}

    def commit(self, end: dict) -> None:
        # Offsets live in the checkpoint (Spark calls this when a batch
        # is durably committed); nothing external to acknowledge.
        pass


class RestJsonStreamDataSource(DataSource):
    """``spark.readStream.format("rest_json_stream")`` — offset-paged
    feed as a stream; page number IS the offset."""

    @classmethod
    def name(cls) -> str:
        return "rest_json_stream"

    def schema(self) -> str:
        raise NotImplementedError(
            "rest_json_stream requires an explicit .schema(...) — same "
            "contract as rest_json."
        )

    def simpleStreamReader(self, schema: StructType) -> RestJsonStreamReader:
        return RestJsonStreamReader(schema, dict(self.options))


def register_stream(spark: "SparkSession") -> None:
    spark.dataSource.register(RestJsonStreamDataSource)
