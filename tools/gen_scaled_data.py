"""Synthesize a larger scale factor from an existing testdata dir.

The driver ships sf0.001/sf0.01/sf0.1; SCALE.md §10's scaling-ratio
audit needs one step beyond that. This tool replicates every FACT
table N times with a per-replica offset added to every join/identity
key, so referential integrity holds (replica r's lineitem rows join
replica r's orders, etc.) while dimension tables (region, nation) stay
fixed — the realistic shape: facts grow, dims don't.

Replica documents get every word suffixed with the replica tag
(`regexp_replace(\\S+ -> $0_r<k>)`): shingle sets across replicas are
then DISJOINT, so MinHash/n-gram dedup workload grows linearly (each
replica reproduces the base corpus's internal dup structure) instead
of every doc becoming a 10-clique of cross-replica near-dups, which
would measure corpus pathology rather than operator scaling.
Embeddings are kept identical across replicas (ANN top-k ties resolve
deterministically by id).

r18 (PERF_r17 scaling block): generated tables are written with 32 MB
parquet row groups (``parquet.block.size``). The driver testdata is
one row group per table — unsplittable, every scan decodes in one
task — and replicating that layout into the generated sf≥1 dirs made
local scale sweeps inherit the same serialization instead of
exercising parallel scans. 32 MB row groups split naturally under both
the local 4 MB ``maxPartitionBytes`` and the cluster 128 MB default,
so low-core vs 32-core pairs on generated data measure real scan
parallelism (the remedy the scale-adaptive spread exists for is the
*driver's* read-only data, not ours).

Usage: python tools/gen_scaled_data.py [--base /root/testdata/sf0.1]
           [--out /root/repo/.benchdata/sf1.0] [--replicas 10]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Per-replica key offset: far above any base key at these SFs, far
# below bigint overflow at any replica count we'd use locally.
OFFSET = 10_000_000

# Row-group size for generated tables (see module docstring): small
# enough that every table splits across cores, large enough that a
# 100 TB-shaped scan is not seek-bound.
ROW_GROUP_BYTES = 32 * 1024 * 1024


def _write(df, dest: str) -> None:
    df.write.mode("overwrite").option(
        "parquet.block.size", str(ROW_GROUP_BYTES)
    ).parquet(dest)

# table -> columns that get the replica offset (join/identity keys
# only; foreign keys into the *unreplicated* dims — nationkey,
# regionkey — keep their values).
KEYED = {
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
COPIED = ["region", "nation"]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/root/repo/.benchdata/sf1.0")
    ap.add_argument("--replicas", type=int, default=10)
    args = ap.parse_args()

    from pyspark.sql import functions as F  # noqa: PLC0415

    from pipeline_airflow_docker_spark.catalog import table  # noqa: PLC0415
    from pipeline_airflow_docker_spark.session import get_spark  # noqa: PLC0415

    spark = get_spark("gen_scaled_data")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(args.out, exist_ok=True)

    for name in COPIED:
        df = table(spark, args.base, name)
        _write(df, os.path.join(args.out, f"{name}.parquet"))
        print(f"{name}: copied ({df.count()} rows)")

    for name, keys in KEYED.items():
        base = table(spark, args.base, name)
        parts = []
        for r in range(args.replicas):
            rep = base
            for k in keys:
                rep = rep.withColumn(k, (F.col(k) + F.lit(r * OFFSET)).cast("long"))
            if name == "documents" and r > 0:
                rep = rep.withColumn(
                    "text", F.regexp_replace("text", r"(\S+)", f"$1_r{r}")
                )
            if name == "embeddings" and r > 0:
                # Per-replica deterministic Rademacher sign flip: sign
                # patterns square away inside any within-replica inner
                # product (<S∘a, S∘b> = <a, b>), so each replica's
                # ANN/dedup workload is an exact copy of the base's —
                # while cross-replica vectors are near-orthogonal.
                # Verbatim copies put 100 identical vectors in every
                # LSH bucket, turning the in-bucket verify quadratic in
                # the replica count (a generator artifact, not an
                # operator property).
                rep = rep.withColumn(
                    "embedding",
                    F.transform(
                        "embedding",
                        lambda x, j: x
                        * (
                            1 - 2 * F.pmod(F.hash(F.lit(r), j), F.lit(2))
                        ).cast("float"),
                    ),
                )
            parts.append(rep)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        dest = os.path.join(args.out, f"{name}.parquet")
        _write(out, dest)
        print(f"{name}: x{args.replicas} -> {out.count()} rows")
    print(f"done: {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
