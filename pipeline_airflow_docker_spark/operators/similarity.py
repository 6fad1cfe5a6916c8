"""Similarity search over embedding columns (SURVEY.md §2 Part C).

Brute-force cosine top-k is the correctness baseline; the sign-bucket
(LSH/IVF-style) variant is the scale path — candidates come from an
equi-join on a locality bucket, so the fact-side shuffle is keyed and
the quadratic compare only happens within buckets. At 100 TB the
bucket count scales with corpus size (n_bits knob) and the per-bucket
join stays broadcast-small for the query side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pipeline_airflow_docker_spark.functions.vectors import cosine, sign_bucket


def knn_cosine(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact top-k cosine neighbors per query (self-match excluded).

    Plan shape: broadcast the (small) query set against the corpus —
    the corpus never shuffles; per-query top-k runs as a bounded
    window. Deterministic tie-break: score desc, neighbor id asc."""
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("qv"), F.col("cv")).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


def knn_cosine_bucketed(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
    n_bits: int = 4,
) -> DataFrame:
    """Approximate top-k: compare only within the query's sign bucket.
    Recall < 1 by design (neighbors straddling a hyperplane are
    missed); n_bits trades recall for candidate-set size — 2^n_bits
    buckets shrink the compared fraction to ~2^-n_bits."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        sign_bucket(F.col(vec_col), n_bits).alias("bkt"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        sign_bucket(F.col(vec_col), n_bits).alias("bkt"),
    )
    scored = (
        c.join(F.broadcast(q), (q.bkt == c.bkt) & (F.col("query_id") != F.col("neighbor_id")))
        .select("query_id", "neighbor_id", cosine(F.col("qv"), F.col("cv")).alias("cos"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )
