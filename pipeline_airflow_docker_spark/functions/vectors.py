"""Deterministic vector math over ``array<float>`` embedding columns.

All folds are sequential left-to-right (``F.aggregate`` /
``F.zip_with``), so the float result is bit-identical across engines
and across cluster runs — FP addition is order-dependent, and a
parallel/pairwise sum would not reproduce. Elements are widened
float->double before multiplying (exact) to match how any engine reads
parquet FLOAT into double math.

JVM-side higher-order functions: no Python, no UDF, whole-stage
codegen applies. At 100 TB the brute-force forms below pair with
LSH/IVF bucketing (operators.dedup / plans.llm) so the quadratic
candidate space never materializes.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product of two float arrays, in double."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; denominator as sqrt(n2a)*sqrt(n2b) — keep
    this exact expression shape in oracle SQL for bit parity."""
    return dot(a, b) / (norm(a) * norm(b))


def sign_bucket(a: Column, n_bits: int = 12) -> Column:
    """Locality bucket from the sign pattern of the first ``n_bits``
    components — an IVF/LSH-style partitioner: vectors only compare
    within their bucket, replacing the O(n^2) self-join with a
    per-bucket join. (With trained hyperplanes the signs would come
    from projections; identity projections keep it deterministic and
    oracle-checkable.)"""
    return F.aggregate(
        F.sequence(F.lit(0), F.lit(n_bits - 1)),
        F.lit(0).cast("long"),
        lambda acc, i: acc
        + F.when(
            F.element_at(a, i + 1).cast("double") > 0,
            F.pow(F.lit(2.0), i).cast("long"),
        ).otherwise(F.lit(0)),
    )


def l2sq(a: Column, b: Column) -> Column:
    """Squared Euclidean distance, sequential fold (deterministic)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
