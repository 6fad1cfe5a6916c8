"""Table catalog over the driver-generated Parquet test tables.

Tables (FIXTURES.md §3): region nation customer supplier part orders
lineitem events documents embeddings — one parquet file per table under
``{sf_dir}/{name}.parquet``.

At 100 TB these would be partitioned lakehouse tables (events by day,
lineitem by ship-month — SURVEY.md §7 Phase 5); the scan API below is
the single place that knowledge lives, so queries never hard-code paths.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Small dimension tables that should always be broadcast in joins.
BROADCAST_TABLES: frozenset[str] = frozenset({"region", "nation"})


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Columnar Parquet scan. Catalyst pushes predicates and prunes
    columns into this scan automatically (verified via .explain —
    PushedFilters / ReadSchema)."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        # events.ts may arrive as parquet TIMESTAMP(NANOS) (Spark 4
        # cannot read it natively: read nanos as long, truncate to
        # microseconds with integer division — double division
        # mis-rounds near microsecond boundaries) or as TIMESTAMP(US)
        # without a timezone, which Spark 4 reads as TIMESTAMP_NTZ.
        # withWatermark and unix_micros both reject NTZ, so normalize
        # to TIMESTAMP: the session timezone is pinned UTC
        # (session.py), so the cast is value-preserving and DuckDB
        # oracle parity holds.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(path)


def register_views(spark: SparkSession, sf_dir: str, suffix: str = "") -> None:
    """Register every table as a temp view (for the spark.sql entry
    point, SURVEY.md §2 B20)."""
    for name in TABLES:
        table(spark, sf_dir, name).createOrReplaceTempView(f"{name}{suffix}")
