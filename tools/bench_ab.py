"""Controlled bench A/B against a recorded driver baseline.

The per-round story since r04: the driver's BENCH_rNN sometimes lands
during host contention, flagging untouched keys at 1.5-2.5x. The
established answer (NOTES_r05/r06, SCALE.md §10) is a quiet-box rerun
at REPS>=11 compared per-key against the newest trustworthy baseline —
re-derived by hand every round until now. This codifies it:

    python tools/bench_ab.py --baseline BENCH_r04.json \
        --keys q_join_asof,q_knn_lsh [--reps 11] [--threshold 1.25]

Runs bench.py as a subprocess (same env knobs), then prints a per-key
table of min/median vs the baseline's, with PASS/FLAG at the noise
threshold (default 1.25 = the documented ±25% floor). Exit 1 if any
key FLAGs — usable as a gate. Compare minima to minima: both sides are
min-of-reps estimates of intrinsic plan cost; medians are shown for
context only (see bench.py's docstring for why min, not median).

Round 8: the run's host-drag calibration (bench.py's fixed-work probes
vs tools/bench_calibration.json) gates the comparison — a drag_ratio
over ``--max-drag`` (default 1.30) exits 2 instead of printing numbers
that could only mislead.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load_baseline(path: str) -> tuple[dict, dict]:
    with open(path) as fh:
        raw = json.load(fh)
    # Driver BENCH_rNN files wrap the bench JSON line under "parsed";
    # a raw `python bench.py > out.json` capture is the line itself.
    rec = raw.get("parsed", raw)
    # Pre-r04 bench records put MEDIANS in "queries" (and have no
    # "queries_median" field); comparing min-of-reps against a median
    # baseline is systematically lenient at the threshold. Require a
    # baseline that records both (r04+), rather than silently degrading.
    if "queries_median" not in rec:
        raise SystemExit(
            f"{path}: no 'queries_median' field — this is a pre-r04 "
            f"baseline whose 'queries' values are MEDIANS, not minima. "
            f"A/B needs a min-based baseline: use BENCH_r04.json or newer."
        )
    return rec["queries"], rec["queries_median"]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--baseline",
        required=True,
        help="BENCH_rNN.json (or raw bench.py output). Must be r04+ — "
        "older records hold medians in 'queries', which this tool rejects.",
    )
    ap.add_argument("--keys", required=True, help="csv of qkeys")
    ap.add_argument("--reps", type=int, default=11)
    ap.add_argument("--threshold", type=float, default=1.25)
    ap.add_argument(
        "--max-drag",
        type=float,
        default=1.30,
        help="refuse (exit 2) when the run's host-drag calibration "
        "ratio exceeds this — numbers from a degraded host are not "
        "comparable to the baseline (two BENCH records, r05/r07, were "
        "poisoned exactly this way)",
    )
    args = ap.parse_args()

    base_min, base_med = load_baseline(args.baseline)
    keys = [k for k in args.keys.split(",") if k]
    missing = [k for k in keys if k not in base_min]
    if missing:
        print(f"not in baseline: {missing}", file=sys.stderr)
        return 2

    env = dict(
        os.environ,
        SPARK_GRAFT_BENCH_KEYS=",".join(keys),
        SPARK_GRAFT_BENCH_REPS=str(args.reps),
        # One pass: this tool's contamination control is its own
        # --reps + the drag gate below; bench.py's r15 multi-pass
        # headline protocol would triple the A/B runtime for nothing.
        SPARK_GRAFT_BENCH_PASSES="1",
    )
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, check=False,
    )
    if proc.returncode != 0:
        sys.stderr.write(proc.stderr[-2000:])
        return 2
    line = proc.stdout.strip().splitlines()[-1]
    got = json.loads(line)

    # Host-drag gate (round 8): bench.py measures fixed-work probes
    # against the committed clean-host reference. A run whose probes
    # came back slow is measuring the HOST, not the code — comparing it
    # against a clean baseline can only produce false FLAGs, so refuse
    # outright rather than emit numbers someone might believe.
    drag = (got.get("calibration") or {}).get("drag_ratio")
    if drag is not None:
        print(f"host drag_ratio: {drag:.2f} (max {args.max_drag})")
        if drag > args.max_drag:
            print(
                f"host degraded: calibration drag_ratio {drag:.2f} exceeds "
                f"--max-drag {args.max_drag} — this run's numbers are not "
                f"comparable to the baseline; rerun on a quiet box.",
                file=sys.stderr,
            )
            return 2

    # A key present in the baseline but no longer in plans.QUERIES is
    # silently dropped by bench.py's registry filter; surface that as a
    # clean error instead of a KeyError traceback below.
    not_run = [k for k in keys if k not in got["queries"]]
    if not_run:
        print(
            f"not in current plans.QUERIES (bench.py skipped them): {not_run}",
            file=sys.stderr,
        )
        return 2

    flagged = 0
    print(f"{'key':24s} {'base_min':>9s} {'ab_min':>8s} {'ratio':>6s}   "
          f"{'base_med':>9s} {'ab_med':>8s}  verdict")
    for k in keys:
        bm, gm = base_min[k], got["queries"][k]
        ratio = gm / bm if bm else float("inf")
        ok = ratio <= args.threshold
        flagged += 0 if ok else 1
        print(f"{k:24s} {bm:9.3f} {gm:8.3f} {ratio:6.2f}   "
              f"{base_med.get(k, float('nan')):9.3f} "
              f"{got.get('queries_median', {}).get(k, float('nan')):8.3f}"
              f"  {'PASS' if ok else 'FLAG'}")
    print(f"\n{len(keys) - flagged}/{len(keys)} within {args.threshold}x of baseline minima")
    return 1 if flagged else 0


if __name__ == "__main__":
    raise SystemExit(main())
