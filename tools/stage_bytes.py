"""Per-stage input/shuffle byte capture for scale-linearity claims.

Round 13's sf100 spot-sweep attributed the above-linear wall-clock
tail (q_fn_map 12.7x, q_corr_spearman 15.3x, q_join_inner 19.2x on
10x data) to cold-scan + scratch-I/O walls with *linear plan volumes*
— argued from plan shape, not measured. This tool converts the
argument into a measurement: it runs each qkey under a UI-enabled
session and reads the completed stages' ``inputBytes`` /
``shuffleReadBytes`` / ``shuffleWriteBytes`` from Spark's REST status
API (the same numbers the Spark UI's stage table shows), summed over
exactly the stages the key's action created.

Run it once per SF dir and diff the totals: if bytes scale ~linearly
while wall-clock doesn't, the wall is I/O bandwidth (which a real
cluster scales with nodes), not plan blow-up.

Usage:
    python tools/stage_bytes.py --sf .benchdata/sf10 q_join_inner q_fn_map
    python tools/stage_bytes.py --sf .benchdata/sf100 --json out.json keys...

Env: respects the usual SPARK_GRAFT_* knobs (DRIVER_MEM, SHUFFLE,
CPUS); forces SPARK_GRAFT_UI=1 before session creation.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Must be set before the session exists: spark.ui.enabled is static.
os.environ.setdefault("SPARK_GRAFT_UI", "1")

METRICS = ("inputBytes", "outputBytes", "shuffleReadBytes", "shuffleWriteBytes")


def _api(base: str, app_id: str, path: str):
    url = f"{base}/api/v1/applications/{app_id}/{path}"
    with urllib.request.urlopen(url, timeout=30) as r:
        return json.load(r)


def _stage_rows(base: str, app_id: str) -> dict[int, dict]:
    """Newest attempt per completed/failed stage id."""
    rows: dict[int, dict] = {}
    for st in _api(base, app_id, "stages"):
        if st.get("status") not in ("COMPLETE", "FAILED"):
            continue
        sid = st["stageId"]
        if sid not in rows or st.get("attemptId", 0) > rows[sid].get("attemptId", 0):
            rows[sid] = st
    return rows


def measure(spark, sf_dir: str, keys: list[str]) -> dict[str, dict]:
    from pyspark.sql import functions as F  # noqa: PLC0415

    from pipeline_airflow_docker_spark import plans  # noqa: PLC0415

    sc = spark.sparkContext
    base, app_id = sc.uiWebUrl, sc.applicationId
    out: dict[str, dict] = {}
    for name in keys:
        before = set(_stage_rows(base, app_id))
        t0 = time.time()
        df = plans.QUERIES[name](spark, sf_dir)
        # Same action shape as scale_sweep.py / bench.py.
        df.select(F.count(F.lit(1)), *[F.count(c) for c in df.columns]).collect()
        wall = time.time() - t0
        stages = {
            sid: st
            for sid, st in _stage_rows(base, app_id).items()
            if sid not in before
        }
        rec: dict = {
            "wall_sec": round(wall, 2),
            "n_stages": len(stages),
            "executorRunTime_sec": round(
                sum(s.get("executorRunTime", 0) for s in stages.values()) / 1e3, 1
            ),
        }
        for m in METRICS:
            rec[m] = sum(s.get(m, 0) for s in stages.values())
        out[name] = rec
        print(
            f"{name:20s} wall={rec['wall_sec']:>8}s stages={rec['n_stages']:>3} "
            + " ".join(f"{m}={rec[m]/1e6:,.1f}MB" for m in METRICS),
            flush=True,
        )
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/repo/.benchdata/sf10")
    ap.add_argument("--json", default=None, help="write results as JSON here")
    ap.add_argument("keys", nargs="+")
    args = ap.parse_args()

    from pipeline_airflow_docker_spark.session import get_spark  # noqa: PLC0415

    spark = get_spark("stage-bytes")
    if not spark.sparkContext.uiWebUrl:
        print("ERROR: Spark UI is disabled; REST metrics unavailable "
              "(session predates SPARK_GRAFT_UI=1?)", file=sys.stderr)
        return 2
    results = measure(spark, args.sf, args.keys)
    payload = {"sf_dir": args.sf, "results": results}
    if args.json:
        with open(args.json, "w") as f:
            json.dump(payload, f, indent=1)
    print(json.dumps(payload))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
