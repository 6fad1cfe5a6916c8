"""Record the clean-host calibration reference for bench.py.

Runs bench.py's two fixed-work probes (single-core sha256 + canonical
32-partition Spark job) across several interleaved cycles and writes
the MINIMUM of each to tools/bench_calibration.json — the committed
reference that turns every future bench run's probe measurements into
a ``drag_ratio``. Interleaving (cpu, spark, cpu, spark, ...) plus
min-of-all approximates the intrinsic host speed even if some cycles
land on contention, exactly like the bench's own min-of-reps.

Re-record ONLY on a quiet box (check that repeated runs agree within a
few percent) — committing a degraded reference would make every later
run look faster than it is and defeat the gate.

    python tools/record_calibration.py [--cycles 5]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402

from pipeline_airflow_docker_spark.session import get_spark  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cycles", type=int, default=5)
    ap.add_argument("--out", default=bench.CALIBRATION_REF)
    args = ap.parse_args()

    spark = get_spark("calibration")
    spark.sparkContext.setLogLevel("ERROR")

    cpu, mem, spk = [], [], []
    for i in range(args.cycles):
        c = bench.cpu_probe()
        m = bench.mem_probe()
        s = bench.spark_probe(spark)
        cpu.append(c)
        mem.append(m)
        spk.append(s)
        print(
            f"# cycle {i}: cpu {c:.4f}s mem {m:.4f}s spark {s:.4f}s",
            file=sys.stderr,
        )

    rec = {
        "cpu_sec": round(min(cpu), 4),
        "mem_sec": round(min(mem), 4),
        "spark_sec": round(min(spk), 4),
        "cycles": args.cycles,
        "cpu_samples": [round(x, 4) for x in cpu],
        "mem_samples": [round(x, 4) for x in mem],
        "spark_samples": [round(x, 4) for x in spk],
        "note": (
            "Clean-host reference for bench.py's fixed-work probes "
            "(cpu_probe: 256x sha256 over 1 MiB; mem_probe: 16x 64 MiB "
            "DRAM copy; spark_probe: 200M-row xxhash64 sum, 32 "
            "partitions). Minima of the recorded samples. Re-record "
            "only on a verified-quiet box."
        ),
    }
    with open(args.out, "w") as fh:
        json.dump(rec, fh, indent=1)
        fh.write("\n")
    print(json.dumps(rec))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
