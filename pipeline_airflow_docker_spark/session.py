"""SparkSession factory + scale-oriented runtime configuration.

The reference executes everything eagerly in single-process pandas with
no optimizer (SURVEY.md §4.1). Here the session is configured for the
opposite: lazy Catalyst plans, AQE re-planning at runtime, skew-join
splitting, and partition coalescing — the settings that matter when the
same plans run on a 1000-executor cluster over ~100 TB.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Confs that are safe/desirable to (re)apply on an existing session at
# runtime — everything here is runtime-settable SQL conf.
RUNTIME_CONF: dict[str, str] = {
    # AQE: runtime re-planning — broadcast-at-runtime, skew-join
    # splitting, and post-shuffle partition coalescing. At 100 TB these
    # replace hand-tuned shuffle partition counts.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow for every pandas/Python boundary (Pandas UDFs, toPandas).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Deterministic timestamp semantics vs the DuckDB oracle.
    "spark.sql.session.timeZone": "UTC",
    # The events table stores TIMESTAMP(NANOS) parquet, which Spark 4
    # rejects by default; read as long, catalog.table converts to
    # microsecond timestamps (truncation — matches DuckDB's ns->us).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # ANSI off: permissive casts match the reference's pandas semantics.
    "spark.sql.ansi.enabled": "false",
    # ...but NOT the legacy size(NULL) = -1 that non-ANSI mode drags
    # in: a -1 "size" silently poisons every token count, ratio, and
    # chunk index computed over a NULL array (the degenerate-data gate
    # caught -1 token counts in nine text qkeys). size(NULL) = NULL
    # matches DuckDB len(NULL) and SQL NULL propagation.
    "spark.sql.legacy.sizeOfNull": "false",
    # WITH RECURSIVE safety valve: the default (1M rows) is sized for
    # toy data — an acyclic hierarchy walk over a 10-scale fact set
    # legitimately produces tens of millions of rows. Cycle protection
    # comes from the acyclic-graph contract (q_recursive_cte) and the
    # per-level semantics, not this limit.
    "spark.sql.cteRecursionRowLimit": str(200_000_000),
    # Streaming state in RocksDB (bundled since Spark 3.2): keeps
    # windowed-agg/dedup state off the executor heap, which is the
    # difference between "works" and "OOMs" for 100 TB-scale stateful
    # queries (SURVEY.md §4.2). Changelog checkpointing uploads deltas,
    # not full snapshots, per micro-batch.
    "spark.sql.streaming.stateStore.providerClass":
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled": "true",
}


def apply_runtime_conf(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable confs to an externally provided session.

    The correctness driver passes us *its* session; we only touch confs
    that are legal to set mid-flight.
    """
    for k, v in RUNTIME_CONF.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            # Not settable on this session (e.g. static conf) — fine.
            pass
    return spark


def get_spark(
    app_name: str = "pipeline_airflow_docker_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or fetch) a session tuned for local testing.

    ``local[N]`` here; on a real cluster the same confs apply, with
    shuffle partitioning left to AQE coalescing from a high initial
    partition count.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        # UI off by default (saves ~1 s startup + a port per test
        # process); SPARK_GRAFT_UI=1 enables it so tools/stage_bytes.py
        # can read per-stage input/shuffle bytes from the REST API.
        # Exact '1' comparison, matching the sibling SPARK_GRAFT_STAGED
        # knob — raw truthiness would make SPARK_GRAFT_UI=0 ENABLE the
        # UI (r14 ADVICE).
        .config(
            "spark.ui.enabled",
            "true" if os.environ.get("SPARK_GRAFT_UI") == "1" else "false",
        )
    )
    if master.startswith("local"):
        # Local-mode split sizing only. The driver testdata is a single
        # ~10 MB parquet file per table; with the cluster defaults
        # (openCostInBytes=4 MB, maxPartitionBytes=128 MB) Spark cuts it
        # into ~3 splits and 29 of local[32]'s cores sit idle on every
        # scan. Shrinking both puts all cores on the scan. NOT applied
        # on a cluster master: at 100 TB the 128 MB default yields
        # ~800 k well-sized tasks, while 4 MB splits would explode the
        # task count 32×.
        builder = builder.config(
            "spark.sql.files.openCostInBytes", str(128 * 1024)
        ).config("spark.sql.files.maxPartitionBytes", str(4 * 1024 * 1024))
        # Shuffle/spill scratch on tmpfs when available: this box's
        # /dev/vda is a shared virtio disk with multi-second latency
        # bursts that land squarely on shuffle-file writes (observed as
        # sporadic 10-20 s stalls of otherwise sub-second plans). On a
        # real cluster spark.local.dir is provisioned node-local SSD —
        # tmpfs is the closest local-mode analog. Test data stays small
        # enough (≲2 GB at sf10) that 126 GB of shm never fills; a
        # cluster deployment does NOT inherit this (guarded to local*).
        if os.path.isdir("/dev/shm"):
            builder = builder.config("spark.local.dir", "/dev/shm/spark_graft_local")
    for k, v in RUNTIME_CONF.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    return apply_runtime_conf(spark)
