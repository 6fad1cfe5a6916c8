#!/usr/bin/env python
"""Physical-layout fuzz fixture — same logical data, hostile layout.

Every fixture so far (sf*, degen, fuzz*) ships each table as ONE
parquet file whose row order is the generator's insertion order. But
nothing in the engine's contract says inputs arrive that way: at
100 TB a table is thousands of part files written by whatever upstream
job produced them, in no particular row order, with some files empty.
Any query whose result (not just its row order — its VALUES, under the
parity gate's order-insensitive hash) depends on the physical layout
is silently wrong at scale: a row_number tie broken by scan order, a
string_agg ordered by partition index, a dedup keep-best that keeps
"the first seen", a stream whose micro-batch boundaries follow file
boundaries.

This tool rewrites a base fixture into that hostile layout,
deterministically (seeded hash, no RNG state):

- each table becomes a DIRECTORY of ``--files`` part files (dims
  included — region's 5 rows hash across 7 partitions, so some
  partitions are empty), PLUS one genuine ZERO-ROW part file per
  table (Spark skips materializing empty partitions on write, so the
  empty-file edge — a thing real lakehouse directories accumulate
  from aborted or rows-filtered writer tasks — has to be planted
  explicitly; both engines must scan past it);
- rows are assigned to files by a seeded xxhash64 over every column,
  and ordered within each file by a second seeded hash — so the
  insertion order visible to scans is fully scrambled but byte-
  reproducible for a given seed;
- timestamp columns are written as TIMESTAMP_NTZ (the session
  timezone is pinned UTC, so the cast is value-preserving) so DuckDB
  reads plain TIMESTAMP exactly as it does from the degen/fuzz
  fixtures, keeping oracle semantics identical.

Round ritual: one full-registry sweep per round —

    python tools/gen_layout_data.py --seed 16
    python tools/check_parity.py --sf /root/repo/.benchdata/layout16

Every key must come back OK / ROWS_ONLY: parity on this fixture IS
the layout-invariance proof (the DuckDB oracle is layout-independent
by construction, so a Spark result that moved with the layout hashes
red).
"""

from __future__ import annotations

import argparse
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def _plant_empty_part(t_dir: str, src_path: str | None = None) -> None:
    """Write one zero-row part file with the table's exact schema.
    Spark never materializes empty partitions on write, so this edge
    (real directories accumulate empty files from aborted/filtered
    writer tasks) must be planted by hand.

    A zero-row BASE table (e.g. scrambling the 'empty' fixture) may
    produce no data part files at all; fall back to the source
    table's schema then (r16 ADVICE — indexing parts[0] crashed)."""
    import pyarrow.parquet as pq  # noqa: PLC0415

    parts = sorted(
        f for f in os.listdir(t_dir) if f.endswith(".parquet")
    )
    if parts:
        schema = pq.read_schema(os.path.join(t_dir, parts[0]))
    else:
        if src_path is None:
            print(f"  (no part files in {t_dir} and no source path — "
                  "skipping empty-part plant)")
            return
        src = src_path
        if os.path.isdir(src):
            inner = sorted(
                f for f in os.listdir(src) if f.endswith(".parquet")
            )
            if not inner:
                print(f"  (no parquet files under {src} — skipping "
                      "empty-part plant)")
                return
            src = os.path.join(src, inner[0])
        schema = pq.read_schema(src)
    pq.write_table(
        schema.empty_table(),
        os.path.join(t_dir, "part-empty-planted.parquet"),
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seed", type=int, default=16)
    ap.add_argument("--base", default="/root/testdata/sf0.001")
    ap.add_argument("--out", default=None,
                    help="default: .benchdata/layout<seed>")
    ap.add_argument("--files", type=int, default=7,
                    help="part files per table (prime by default so "
                         "file boundaries never align with any "
                         "power-of-two batch size)")
    args = ap.parse_args()
    out = args.out or os.path.join(_REPO, ".benchdata", f"layout{args.seed}")

    from pyspark.sql import functions as F  # noqa: PLC0415

    from pipeline_airflow_docker_spark.catalog import TABLES, table  # noqa: PLC0415
    from pipeline_airflow_docker_spark.session import get_spark  # noqa: PLC0415

    spark = get_spark("gen-layout")
    spark.sparkContext.setLogLevel("ERROR")
    for name in TABLES:
        df = table(spark, args.base, name)
        for col, dtype in df.dtypes:
            if dtype == "timestamp":
                df = df.withColumn(col, F.col(col).cast("timestamp_ntz"))
        cols = [F.col(c) for c in df.columns]
        scrambled = (
            df.repartition(args.files, F.xxhash64(*cols, F.lit(args.seed)))
            .sortWithinPartitions(F.xxhash64(*cols, F.lit(args.seed + 1)))
        )
        t_dir = os.path.join(out, f"{name}.parquet")
        scrambled.write.mode("overwrite").parquet(t_dir)
        _plant_empty_part(t_dir, os.path.join(args.base, f"{name}.parquet"))
        n_parts = len([
            f for f in os.listdir(t_dir) if f.endswith(".parquet")
        ])
        print(f"{name}: {df.count()} rows -> {n_parts} part files "
              f"(incl. 1 zero-row)")
    print(f"layout fixture (seed {args.seed}, {args.files} files/table) "
          f"at {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
