"""Pluggable intermediate-result materialization.

Several operators (MinHash/SimHash dedup, connected components) read a
CPU-expensive intermediate several times, or iterate and must truncate
lineage. HOW that intermediate is pinned is a deployment decision, not
an operator decision:

- ``local_checkpoint`` (default): executor-memory materialization +
  lineage truncation. Fastest locally and in tests, but pins the data
  in executor storage memory — the wrong trade at 100 TB, where a
  large shingle table would evict shuffle/cache pages or OOM.
- ``disk_persist``: ``persist(StorageLevel.DISK_ONLY)`` + eager count.
  Spillable (executor local disk), survives memory pressure; lineage
  is kept but the physical plan reads the cached blocks.
- ``parquet_scratch``: write to scratch parquet and read back — the
  cluster-scale shape (a scratch table on the shuffle-independent
  store). Fully spillable, truncates lineage, and the re-read scan is
  columnar; survives executor loss, which executor-local
  materializations do not.

Select globally with ``SPARK_GRAFT_MATERIALIZE`` or per-call via the
``how`` argument. Operators call :func:`materialize` and stay agnostic.
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

MODES = ("local_checkpoint", "disk_persist", "parquet_scratch")

_SCRATCH_ROOT: str | None = None


def _scratch_dir() -> str:
    global _SCRATCH_ROOT  # noqa: PLW0603
    if _SCRATCH_ROOT is None:
        _SCRATCH_ROOT = os.environ.get(
            "SPARK_GRAFT_SCRATCH"
        ) or tempfile.mkdtemp(prefix="spark_graft_scratch_")
    return _SCRATCH_ROOT


def materialize(df: DataFrame, how: str | None = None) -> DataFrame:
    """Materialize ``df`` once so downstream consumers re-read instead
    of recomputing. Returns a DataFrame backed by the materialized
    data. See module docstring for the mode trade-offs."""
    how = how or os.environ.get("SPARK_GRAFT_MATERIALIZE", "local_checkpoint")
    if how == "local_checkpoint":
        return df.localCheckpoint(eager=True)
    if how == "disk_persist":
        out = df.persist(StorageLevel.DISK_ONLY)
        out.count()  # eager: pay the materialization here, once
        return out
    if how == "parquet_scratch":
        path = os.path.join(_scratch_dir(), uuid.uuid4().hex)
        df.write.mode("overwrite").parquet(path)
        # Re-apply the writer's schema so column types round-trip
        # exactly. Nullability still widens to nullable — Spark marks
        # every file-source field nullable by design — which is safe
        # (values are unchanged) but means this mode's schema is not
        # bit-identical to the input's; dtypes are.
        return df.sparkSession.read.schema(df.schema).parquet(path)
    raise ValueError(f"unknown materialize mode {how!r}; known: {MODES}")
