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


def _gapfill_capped_prepare(spark, sf_dir):
    """q_gapfill's documented scale path, measured IN-sweep (r11
    verdict #3): the uncapped min..max grid legitimately exceeds any
    fill budget on a sparse-enough corpus (sf10: a 95.4M-bucket grid,
    refused by design), so the sweep times the capped form —
    max_gap_hours=24 treats longer gaps as series breaks, bounding
    generated rows at 24 × gap-count — with a budget sized for the
    capped output (the r11 hand-run: 72,954,600 rows in 15.1 s). The
    uncapped refusal stays pinned by tests/test_timeseries.py and the
    graded q_gapfill key keeps the oracle-mirrored uncapped semantics."""
    from pyspark.sql import functions as F  # noqa: PLC0415

    from pipeline_airflow_docker_spark.catalog import table  # noqa: PLC0415
    from pipeline_airflow_docker_spark.operators.timeseries import (  # noqa: PLC0415
        gap_fill_hourly,
    )

    e = table(spark, sf_dir, "events").filter(
        (F.col("ts") >= F.lit("2024-01-01 00:00:00").cast("timestamp"))
        & (F.col("ts") < F.lit("2025-01-01 00:00:00").cast("timestamp"))
    )
    # Scale-aware budget (r13: the fixed 200M refused at sf100 —
    # 633,963,000 capped buckets — and the evidence needed a hand-run).
    # Under max_gap_hours=24 the fill generates at most 24 rows per
    # observed gap and gaps < observed rows, so 25 x the window's row
    # count is a provable ceiling at ANY fixture scale: the capped
    # sweep entry always runs, while the operator's refusal semantics
    # for true overruns stay untouched (pinned in
    # tests/test_timeseries.py and exercised by the graded uncapped
    # q_gapfill key).
    # The budget scan runs HERE, in the untimed prepare step — r14 ran
    # it inside the timed region, so r14's q_gapfill(capped) wall
    # includes one extra full scan of the filtered events table that
    # r13's and r15+'s numbers don't (r14 ADVICE; noted in the r15
    # evidence header so the delta isn't misread as a speedup).
    budget = 25 * (e.count() or 1)

    def run(spark, sf_dir):
        return gap_fill_hourly(
            e, "user_id", "ts", "value",
            max_fill_steps=budget, max_gap_hours=24,
        )

    return run


# Keys whose graded form refuses by design at big SFs get their
# documented scale path timed instead, under a "(capped)" label. The
# value is a PREPARE function: called untimed, returns the (spark,
# sf_dir) callable the sweep times — so budget scans and other setup
# stay out of the reported wall-clock.
CAPPED_VARIANTS = {"q_gapfill": ("q_gapfill(capped)", _gapfill_capped_prepare)}


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
        if name in CAPPED_VARIANTS:
            label, prepare = CAPPED_VARIANTS[name]
            # untimed: budget scans etc. — but still a real Spark
            # action, so a failure here must be recorded per-key and
            # the sweep must continue (r15 ADVICE), exactly like a
            # failure in the timed region below.
            try:
                fn = prepare(spark, args.sf)
            except Exception as e:  # noqa: BLE001
                results.append(
                    (label, None, f"prepare: {type(e).__name__}: {e}"[:120])
                )
                r = results[-1]
                print(f"{r[0]:28s} {'-':>8} {r[2][:80]}", flush=True)
                continue
        else:
            label, fn = name, plans.QUERIES[name]
        t0 = time.time()
        try:
            df = fn(spark, args.sf)
            # Same action shape as bench.py: JVM-side count+checksum of
            # every column, no driver materialization of wide rows.
            df.select(
                F.count(F.lit(1)),
                *[F.count(c) for c in df.columns],
            ).collect()
            results.append((label, round(time.time() - t0, 2), "ok"))
        except Exception as e:  # noqa: BLE001
            results.append((label, None, f"{type(e).__name__}: {e}"[:120]))
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
