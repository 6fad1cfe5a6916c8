"""Registry mapping qkeys -> (Spark callable, DuckDB oracle SQL).

Contract (driver, /root/repo/__spark_entry__.py): the driver runs each
``QUERIES[name](spark, sf_dir)`` AND ``ORACLES[name]`` via DuckDB on the
same parquet tables, comparing row-count + schema + order-insensitive
value hash. Column names are part of the contract — alias everything
identically on both sides.

Determinism rules every registered query follows (so hashes can match):
- no wall-clock (``current_timestamp``) in outputs; derive timestamps
  from data instead,
- no unordered LIMIT / arbitrary-row dedup; always a total order or a
  key-side aggregate,
- no raw double SUM/AVG across rows (FP addition is order-dependent and
  Spark/DuckDB aggregate in different orders): sum via exact DECIMAL,
  cast the final value back to double.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register ``fn`` under ``name``; ``oracle`` is DuckDB SQL over the
    pre-registered views (region nation customer supplier part orders
    lineitem events documents embeddings). ``oracle=None`` => the driver
    records a weaker rows-only check (reserved for genuinely
    non-SQL-expressible ops)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query key {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco
