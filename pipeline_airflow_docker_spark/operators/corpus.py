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
    dedup_exact,
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
    collapse_exact: bool = True,
) -> DataFrame:
    """Clean a document corpus for training.

    Returns ``(id_col, quality, split)`` for every *kept* document:
    quality >= ``quality_min`` and the minimum-id representative of its
    near-duplicate component. Dropped rows are low-quality docs and
    non-representative near-dups (a doc beaten by a lower-id near-dup
    anywhere in its dup cluster, including transitively).

    ``collapse_exact`` (default on) collapses byte-identical texts to
    their min-id copy BEFORE the LSH stage. k identical documents share
    every band key, so feeding them to LSH directly creates k(k-1)/2
    candidate pairs in every band bucket — the quadratic pocket that
    boilerplate-heavy corpora hit at 100 TB. The collapse is
    result-identical, not an approximation: identical texts are
    Jaccard-1.0 near-dups, so each exact group's min-id member survives
    exactly when its group would have; the final keep-set (min-id rep
    per near-dup component) is unchanged. NULL-text rows bypass the
    collapse: under the round-5 NULL contract they never LSH-match
    anything — each is its own component — while a text groupBy would
    merge them into one group and silently drop all but one.
    """
    q = quality_score(df, id_col, text_col)
    # Materialized once: the kept set feeds pair generation, the
    # component node list, and the final representative join — without
    # this the scan + quality join recomputes per consumer (same
    # rationale as the signature-table checkpoint in dedup.py).
    kept = materialize(df.join(
        q.filter(F.col("quality") >= quality_min), on=id_col, how="inner"
    ))
    if collapse_exact:
        # Key the collapse window on (md5 digest, text), not the raw
        # text alone: the window's shuffle/sort otherwise uses the full
        # document body as its key, so every comparison during the sort
        # walks two long strings byte-by-byte. With the 32-char digest
        # leading, sort comparisons resolve on the digest except between
        # genuinely identical texts; the full-text column stays in the
        # key purely as the exactness tiebreak (a digest collision can
        # never merge distinct texts), so the result is bit-identical.
        collapsed = dedup_exact(
            kept.filter(F.col(text_col).isNotNull()).withColumn(
                "__tdig", F.md5(F.col(text_col))
            ),
            ["__tdig", text_col],
            order=[F.col(id_col)],
        ).drop("__tdig")
        lsh_in = collapsed.unionByName(kept.filter(F.col(text_col).isNull()))
    else:
        lsh_in = kept
    pairs = minhash_dup_pairs(
        lsh_in, id_col, text_col, threshold=jaccard_threshold
    ).select("id_a", "id_b")
    # Nodes are the LSH inputs only: a collapsed-away exact dup can
    # never be its component's min id (its group rep has a smaller id
    # and Jaccard 1.0 puts both in the same component), so it is
    # drop-equivalent to the uncollapsed run.
    comp = resolve_components(lsh_in.select(id_col), pairs, id_col=id_col)
    reps = comp.filter(F.col("id") == F.col("component")).select(
        F.col("id").alias(id_col)
    )
    out = kept.join(reps, on=id_col, how="inner").select(id_col, "quality")
    return hash_split(out, id_col, splits=splits, seed=seed)
