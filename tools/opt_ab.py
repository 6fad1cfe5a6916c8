"""Per-key A/B micro-bench for the optimization rounds.

Times one or more candidate DataFrame builders against the registry
baseline with BOTH actions:
  - the bench's count+xxhash64 checksum collect (comparability with
    bench.py numbers), and
  - the noop sink (guide §1.4 — forces every column of every row,
    no driver transfer), reported separately.

Usage:
    python tools/opt_ab.py q_agg_group            # baseline only
    (variants are registered in code below / via --variant module:fn)

Prints min/median of N reps after a warmup, per action, per variant.
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS,
OPT_AB_REPS (default 5).
"""

from __future__ import annotations

import importlib
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from pipeline_airflow_docker_spark import plans  # noqa: E402
from pipeline_airflow_docker_spark.session import get_spark  # noqa: E402


def time_df(spark, build, reps: int, label: str) -> None:
    import gc

    def checksum_once():
        df = build()
        return df.select(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.xxhash64(*[F.col(c) for c in df.columns])).alias("h"),
        ).collect()[0]

    def noop_once():
        build().write.format("noop").mode("overwrite").save()
        return None

    for action, run in (("checksum", checksum_once), ("noop", noop_once)):
        run()  # warmup (codegen etc.)
        samples = []
        out = None
        for _ in range(reps):
            gc.collect()
            t0 = time.perf_counter()
            out = run()
            samples.append(time.perf_counter() - t0)
        detail = "/".join(f"{s:.3f}" for s in samples)
        extra = f" n={out['n']} h={out['h']}" if out is not None else ""
        print(
            f"{label:40s} {action:8s} min {min(samples):.3f}s "
            f"median {statistics.median(samples):.3f}s [{detail}]{extra}",
            flush=True,
        )


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("OPT_AB_REPS", "5"))
    spark = get_spark("opt_ab")
    spark.sparkContext.setLogLevel("ERROR")

    args = sys.argv[1:]
    variants: list[tuple[str, object]] = []
    keys: list[str] = []
    for a in args:
        if ":" in a:  # module:function variant builder fn(spark, sf_dir)
            mod, fn = a.rsplit(":", 1)
            variants.append((a, getattr(importlib.import_module(mod), fn)))
        else:
            keys.append(a)

    for k in keys:
        spark.sparkContext.setJobDescription(f"opt_ab baseline {k}")
        time_df(spark, lambda k=k: plans.QUERIES[k](spark, sf_dir), reps, f"{k} [baseline]")
    for name, fn in variants:
        spark.sparkContext.setJobDescription(f"opt_ab variant {name}")
        time_df(spark, lambda fn=fn: fn(spark, sf_dir), reps, f"[{name}]")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
