"""End-to-end corpus cleaning: the composition that turns the
individual LLM-data operators into a training-data pipeline.

quality filter -> MinHash near-dup pairs -> connected-components
resolution (keep-min-id) -> deterministic train/val/test split. This
is the standard pre-training data path (quality gate, then global
near-dedup, then content-addressed splits); each stage is the
already-oracle-checked operator, so the composite stays hash-checkable
end-to-end.

Scale shape: one quality pass (map-side), the LSH band shuffle from
``minhash_dup_pairs``, O(diameter) keyed label-propagation rounds over
the (tiny) pair list, and a map-side split assignment — no stage
introduces a join or shuffle the component operators didn't already
have.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pipeline_airflow_docker_spark.functions.materialize import materialize

from pipeline_airflow_docker_spark.operators.dedup import (
    minhash_dup_pairs,
    resolve_components,
)
from pipeline_airflow_docker_spark.operators.splits import hash_split
from pipeline_airflow_docker_spark.operators.textstats import quality_score


def clean_corpus(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    quality_min: float = 0.6,
    jaccard_threshold: float = 0.8,
    splits: dict[str, float] | None = None,
    seed: int = 42,
) -> DataFrame:
    """Clean a document corpus for training.

    Returns ``(id_col, quality, split)`` for every *kept* document:
    quality >= ``quality_min`` and the minimum-id representative of its
    near-duplicate component. Dropped rows are low-quality docs and
    non-representative near-dups (a doc beaten by a lower-id near-dup
    anywhere in its dup cluster, including transitively).
    """
    q = quality_score(df, id_col, text_col)
    # Materialized once: the kept set feeds pair generation, the
    # component node list, and the final representative join — without
    # this the scan + quality join recomputes per consumer (same
    # rationale as the signature-table checkpoint in dedup.py).
    kept = materialize(df.join(
        q.filter(F.col("quality") >= quality_min), on=id_col, how="inner"
    ))
    pairs = minhash_dup_pairs(
        kept, id_col, text_col, threshold=jaccard_threshold
    ).select("id_a", "id_b")
    comp = resolve_components(kept.select(id_col), pairs, id_col=id_col)
    reps = comp.filter(F.col("id") == F.col("component")).select(
        F.col("id").alias(id_col)
    )
    out = kept.join(reps, on=id_col, how="inner").select(id_col, "quality")
    return hash_split(out, id_col, splits=splits, seed=seed)
