"""Iterative graph analytics on DataFrames: fixed-point PageRank.

PageRank is the canonical "iterative joins" workload (domain authority
for web-corpus curation, citation weighting). Two scale/determinism
problems with the textbook float version:

1. Each iteration SUMS incoming double contributions — FP addition is
   order-dependent, so two runs (or Spark vs an oracle) disagree in the
   last ulps and the disagreement compounds per iteration.
2. Naive implementations collect ranks to the driver between rounds.

This implementation keeps ranks in **integer fixed-point** (micro-units
of ``scale``, default 1e12): contributions are ``rank div deg`` and the
damping update is ``((100-d)*base + d*incoming) div 100`` — pure int64
arithmetic, exact and associative, so partial aggregation across any
partitioning reproduces bit-identically, and an oracle can unroll the
same iterations in SQL and hash-match. The floor-division bias is
bounded by ``deg/scale`` per node per round — irrelevant at 1e12 scale.

Distribution: each round is one join (ranks ⋈ edges on src — both
sides hash-partitioned on the join key) + one groupBy(dst) with
map-side partial sums. Nothing is collected to the driver; the node
count rides a 1-row broadcast cross join. Per ``checkpoint_every``,
lineage is truncated via functions/materialize (the resolve_components
pattern) so deep iteration counts cannot grow the logical plan
unboundedly.

No reference-parity citation: the reference engine has no graph
operators; this extends Part B closure (SURVEY.md §2 B49).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pipeline_airflow_docker_spark.functions.materialize import (
    materialize,
    release,
)


def symmetrize(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Undirected view of an edge list: both directions, deduped.
    Guarantees every node has out-degree >= 1 (no dangling mass)."""
    fwd = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    rev = edges.select(F.col(dst).alias("src"), F.col(src).alias("dst"))
    return fwd.unionByName(rev).distinct()


def pagerank_fixed_point(
    edges: DataFrame,
    iterations: int = 3,
    damping_pct: int = 85,
    scale: int = 10**12,
    checkpoint_every: int | None = 8,
) -> DataFrame:
    """PageRank over a directed edge list ``(src, dst)`` in exact
    integer fixed-point. Every node must appear as a src at least once
    (use :func:`symmetrize` for undirected graphs); nodes with no
    in-edges keep the teleport mass only.

    Returns one row per node: ``(node, deg, rank_fp)`` where
    ``rank_fp`` is the rank in 1/``scale`` units (sums to ~``scale``
    over all nodes, minus bounded floor-division loss).
    """
    if not 0 < damping_pct < 100:
        raise ValueError(f"damping_pct must be in (0,100), got {damping_pct}")
    if iterations < 0:
        raise ValueError(f"iterations must be >= 0, got {iterations}")
    # The edge list is read 1 + iterations times (degree count + one
    # contribution join per round). Materialize it once — callers
    # typically hand in a built subtree (fact join + distinct +
    # symmetrize union), and without pinning it Spark re-executes that
    # subtree every round. Unlike the dedup shingle table, edges are
    # FACT-SCALE (O(graph)), so the default here is the spillable
    # disk mode, not the in-memory checkpoint — a ~100 M-edge list
    # memory-checkpointed OOMs an 8 GB local heap outright. An
    # explicit SPARK_GRAFT_MATERIALIZE still overrides.
    import os  # noqa: PLC0415

    # Pin the edge list PRE-PARTITIONED on src: the persisted plan's
    # outputPartitioning (hashpartitioning(src)) then satisfies both
    # the degree aggregate and EVERY iteration's contribution join, so
    # only the (node-scale) ranks side shuffles per round — without
    # this, the identical fact-scale edge list re-exchanges every
    # iteration. Survives local_checkpoint and disk_persist (cached
    # plans carry partitioning); parquet_scratch re-reads lose it,
    # which costs the exchange back but stays correct.
    edges = materialize(
        edges.repartition(F.col("src")),
        how=os.environ.get("SPARK_GRAFT_MATERIALIZE", "disk_persist"),
    )
    deg = edges.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    n1 = deg.agg(F.count(F.lit(1)).alias("__n"))
    base = F.expr(f"{scale} div __n")
    ranks = (
        deg.crossJoin(F.broadcast(n1))
        .select("node", "deg", base.alias("base"), base.alias("rank_fp"))
    )
    keep_pct = 100 - damping_pct
    # pinned = the LAST materialize() result (release() frees only
    # objects materialize() itself returned — releasing a lazy plan
    # built on top of one is a no-op, so the superseded checkpoint
    # must be tracked explicitly, same swap as resolve_components).
    pinned = None
    for i in range(iterations):
        contrib = (
            ranks.join(edges, ranks["node"] == edges["src"])
            .select(
                F.col("dst").alias("node"),
                F.expr("rank_fp div deg").alias("__c"),
            )
            .groupBy("node")
            .agg(F.sum("__c").alias("__incoming"))
        )
        ranks = ranks.drop("rank_fp").join(contrib, "node", "left").select(
            "node",
            "deg",
            "base",
            F.expr(
                f"({keep_pct} * base + {damping_pct} *"
                " coalesce(__incoming, 0)) div 100"
            ).alias("rank_fp"),
        )
        if checkpoint_every and (i + 1) % checkpoint_every == 0:
            ranks = materialize(ranks, truncate=True)
            if pinned is not None:
                release(pinned)
            pinned = ranks
    # The returned plan must not depend on the pinned edge list, or the
    # pin could never be released: a DISK_ONLY persist() registers in
    # the JVM CacheManager keyed by the logical plan and survives until
    # an explicit unpersist — a session running pagerank over many edge
    # lists would accumulate disk-cache entries forever (and a bench
    # warmup's cache would leak into the timed reps). Materialize the
    # node-scale result with fresh lineage (cheap: O(nodes), not
    # O(edges)), then release every pin before returning.
    ranks = materialize(ranks.select("node", "deg", "rank_fp"), truncate=True)
    if pinned is not None:
        release(pinned)
    release(edges)
    return ranks


__all__ = ["pagerank_fixed_point", "symmetrize"]
