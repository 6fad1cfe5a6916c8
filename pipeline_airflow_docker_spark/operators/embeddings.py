"""Embedding-column operators for LLM training-data pipelines
(SURVEY.md §2 Part C): L2 normalization and int8 quantization.

Serving/index builds store embeddings normalized (so cosine becomes a
dot product) and quantized (4x smaller than float32, the difference
between an index fitting in RAM or not at 100 TB). Both operators are
pure JVM higher-order functions over ``array<float>`` — map-side, zero
shuffle, whole-stage codegen; a 100 TB embedding table streams through
untouched by any exchange.

Quantization scheme: symmetric absmax int8 — per-vector scale
``absmax/127``, element ``q = floor(x/scale + 0.5)`` (explicit
half-up, because built-in round() semantics differ across engines;
floor(+0.5) is bit-identical everywhere). All-zero vectors quantize to
all zeros with scale 0.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pipeline_airflow_docker_spark.functions.vectors import norm


def _absmax(v: Column) -> Column:
    return F.array_max(F.transform(v, lambda x: F.abs(x.cast("double"))))


def l2_normalize(
    df: DataFrame, vec_col: str = "embedding", out_col: str = "unit"
) -> DataFrame:
    """Append ``out_col`` = the unit-length vector (doubles). Zero
    vectors pass through as zeros rather than NaN."""
    v = F.col(vec_col)
    n = norm(v)
    unit = F.when(
        n > 0, F.transform(v, lambda x: x.cast("double") / n)
    ).otherwise(F.transform(v, lambda x: F.lit(0.0)))
    return df.withColumn(out_col, unit)


def quantize_int8(
    df: DataFrame,
    vec_col: str = "embedding",
) -> DataFrame:
    """Append symmetric-absmax int8 quantization columns:
    ``scale`` (double), ``q`` (array<int> in [-127, 127]), and the
    vector's L2 ``vnorm`` kept for re-scoring after approximate search.
    """
    v = F.col(vec_col)
    mx = _absmax(v)
    scale = mx / F.lit(127.0)
    q = F.when(
        mx > 0,
        F.transform(
            v,
            lambda x: F.floor(x.cast("double") / scale + F.lit(0.5)).cast("int"),
        ),
    ).otherwise(F.transform(v, lambda x: F.lit(0)))
    return (
        df.withColumn("scale", scale)
        .withColumn("q", q)
        .withColumn("vnorm", norm(v))
    )
