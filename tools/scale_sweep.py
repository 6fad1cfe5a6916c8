"""One-shot Spark-side timing sweep of every batch qkey at a scale
factor — the round ritual behind SCALE.md §10's sf10 tables (round 4
ran it ad hoc; this makes it repeatable).

Unlike bench.py (warmup + min-of-reps on a curated headline set), this
runs each key ONCE, cold, and reports wall-clock — the goal is spotting
scale-killers (a key whose time explodes vs the previous round's sweep)
and outright failures, not publishing tight numbers. Streaming keys are
excluded for the same reason as tools/plan_audit.py. No DuckDB side:
oracle parity at big SFs is check_parity's job on the scales where the
oracle engine is practical.

Usage: python tools/scale_sweep.py [--sf /root/repo/.benchdata/sf10]
           [--skip key1,key2] [keys...]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.plan_audit import is_streaming  # noqa: E402

# Documented quadratic correctness baselines (SCALE.md §10) — excluded
# by default at sf10 exactly as in round 4's sweep.
DEFAULT_SKIP = {"q_dedup_embedding", "q_dedup_ngram", "q_semdedup"}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/repo/.benchdata/sf10")
    ap.add_argument("--skip", default=",".join(sorted(DEFAULT_SKIP)))
    ap.add_argument("keys", nargs="*")
    args = ap.parse_args()
    skip = {k for k in args.skip.split(",") if k}

    from pyspark.sql import functions as F  # noqa: PLC0415

    from pipeline_airflow_docker_spark import plans  # noqa: PLC0415
    from pipeline_airflow_docker_spark.session import get_spark  # noqa: PLC0415

    spark = get_spark("scale-sweep")
    keys = args.keys or [
        k for k in sorted(plans.QUERIES) if not is_streaming(k) and k not in skip
    ]
    results: list[tuple[str, float | None, str]] = []
    for name in keys:
        t0 = time.time()
        try:
            df = plans.QUERIES[name](spark, args.sf)
            # Same action shape as bench.py: JVM-side count+checksum of
            # every column, no driver materialization of wide rows.
            df.select(
                F.count(F.lit(1)),
                *[F.count(c) for c in df.columns],
            ).collect()
            results.append((name, round(time.time() - t0, 2), "ok"))
        except Exception as e:  # noqa: BLE001
            results.append((name, None, f"{type(e).__name__}: {e}"[:120]))
        r = results[-1]
        print(f"{r[0]:28s} {r[1] if r[1] is not None else '-':>8} {r[2][:80]}",
              flush=True)
    fails = [r for r in results if r[1] is None]
    timed = sorted((r for r in results if r[1] is not None),
                   key=lambda r: -r[1])
    print(f"\n# {len(results)} keys, {len(fails)} failed; slowest 10:")
    for name, sec, _ in timed[:10]:
        print(f"#   {name}: {sec}s")
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
