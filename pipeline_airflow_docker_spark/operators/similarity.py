"""Similarity search over embedding columns (SURVEY.md §2 Part C).

Brute-force cosine top-k is the correctness baseline; the sign-bucket
(LSH/IVF-style) variant is the scale path — candidates come from an
equi-join on a locality bucket, so the fact-side shuffle is keyed and
the quadratic compare only happens within buckets. At 100 TB the
bucket count scales with corpus size (n_bits knob) and the per-bucket
join stays broadcast-small for the query side.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pipeline_airflow_docker_spark.functions.vectors import cosine, l2sq, sign_bucket


def _with_vector_set(
    df: DataFrame,
    vectors: list[tuple[int, list[float]]],
    col_name: str,
    id_type: str = "BIGINT",
) -> DataFrame:
    """Attach a small (id, vector) set to every row of ``df`` as ONE
    array-of-struct column, shipped through a broadcast 1-row
    crossJoin rather than inlined as a literal expression.

    Why not ``F.array(F.lit(...))``: a literal quantizer is serialized
    into every task's expression tree, so plan size — and per-task
    deserialization — grows O(k*dim); at k*dim in the 10^5+ range that
    bloats the plan (ADVICE r03). A LocalRelation aggregated to one
    ``collect_list`` row and broadcast moves the same floats through
    the torrent broadcast exchange (once per executor), keeping the
    serialized plan O(1) in k while the downstream ``F.aggregate``
    fold is the *same JVM expression* — same sequential float
    arithmetic, same tie-breaks, bit-identical results (the DuckDB
    oracles stay hash-green).

    ``sort_array`` pins element order to ascending id (ids must be
    unique): folds break argmax/argmin ties toward the first-seen
    element, so array order is semantics, and ``collect_list`` alone
    gives no order guarantee.
    """
    if col_name in df.columns:
        raise ValueError(
            f"column {col_name!r} already exists on the input frame; "
            "rename it before calling this operator"
        )
    spark = df.sparkSession
    rows = [(int(i), [float(x) for x in v]) for i, v in vectors]
    vdf = spark.createDataFrame(rows, f"id {id_type}, v ARRAY<DOUBLE>")
    one = vdf.agg(
        F.sort_array(F.collect_list(F.struct("id", "v"))).alias(col_name)
    )
    return df.crossJoin(F.broadcast(one))


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


def knn_cosine_ivf(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
    n_anchors: int = 8,
    n_probe: int = 2,
    anchors: list[tuple[int, list[float]]] | None = None,
) -> DataFrame:
    """Approximate top-k via an IVF (inverted-file) index.

    The coarse quantizer is ``n_anchors`` corpus vectors (the smallest
    ids — deterministic), or, when ``anchors`` is given, any
    externally trained ``(aid, vector)`` centroid set — e.g.
    ``kmeans_centroids`` output (the FAISS train-then-index shape).
    Anchors are collected to the driver and re-attached as a broadcast
    1-row array column (``_with_vector_set``), the same way FAISS
    keeps the coarse quantizer resident on every node: **cell
    assignment is then a pure map-side fold — the corpus never
    shuffles and never equi-joins to assign cells** — while the
    serialized plan stays O(1) in ``n_anchors`` (the floats travel in
    the broadcast exchange, not the expression tree). Queries probe
    their ``n_probe`` nearest cells and compare exactly only within
    them, so the scanned fraction is ~n_probe/n_anchors. Recall < 1 by
    design (a true neighbor in an unprobed cell is missed).

    Determinism: sequential fold argmax, ties broken toward the
    smaller anchor id — bit-reproducible across engines, so the DuckDB
    oracle hash-checks this exactly (plans/llm.py::q_knn_ivf).
    """
    if anchors is None:
        anchors = [
            (r[0], [float(x) for x in r[1]])
            for r in corpus.select(id_col, vec_col)
            .orderBy(id_col)
            .limit(n_anchors)
            .collect()
        ]

    def _cell(v):
        """argmax_a cosine(v, a.v); first-seen (smallest aid) wins ties."""
        init = F.struct(
            F.lit(float("-inf")).alias("best"),
            F.lit(-1).cast("bigint").alias("aid"),
        )
        return F.aggregate(
            F.col("__anchors"),
            init,
            lambda acc, a: F.when(
                cosine(v, a["v"]) > acc["best"],
                F.struct(cosine(v, a["v"]).alias("best"), a["id"].alias("aid")),
            ).otherwise(acc),
        )["aid"]

    c = _with_vector_set(corpus, anchors, "__anchors").select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        _cell(F.col(vec_col)).alias("cell"),
    )

    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    wp = Window.partitionBy("query_id").orderBy(F.col("acos").desc(), "cell")
    probes = (
        _with_vector_set(q, anchors, "__anchors")
        .select("query_id", "qv", F.explode(F.col("__anchors")).alias("a"))
        .select(
            "query_id",
            "qv",
            F.col("a.id").alias("cell"),
            cosine(F.col("qv"), F.col("a.v")).alias("acos"),
        )
        .withColumn("rn", F.row_number().over(wp))
        .filter(F.col("rn") <= n_probe)
        .select("query_id", "qv", "cell")
    )

    scored = c.join(
        F.broadcast(probes),
        (probes.cell == c.cell) & (F.col("query_id") != F.col("neighbor_id")),
    ).select("query_id", "neighbor_id", cosine(F.col("qv"), F.col("cv")).alias("cos"))
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


def kmeans_lloyd(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    n_iter: int = 5,
    snap_bits: int | None = None,
) -> DataFrame:
    """Distributed Lloyd's k-means over an embedding column — the
    trained coarse quantizer for `knn_cosine_ivf` (which accepts any
    centroid set; its lowest-id anchors are the untrained default).

    Per iteration: (1) assignment is a map-side fold over the
    driver-resident centroid set, attached as a broadcast 1-row array
    column (same deployment shape as the IVF quantizer — the corpus
    never shuffles to be assigned, and the serialized plan stays O(1)
    in k*dim); (2) the update step computes per-cluster
    dimension means via posexplode + groupBy — one keyed shuffle of
    (cluster, dim, partial-sum) rows, map-side combined, never the
    vectors themselves. Driver traffic per iteration is k*dim means —
    the centroids — which is the irreducible output of the step.

    Deterministic: init = k lowest-id vectors, squared-L2 argmin with
    ties to the lower cluster id, fixed iteration count (no
    convergence-by-float-epsilon), so assignments reproduce across
    runs, partitionings, and engines. Empty clusters keep their
    previous centroid.

    ``snap_bits``: when set, each updated centroid coordinate is
    snapped to the dyadic grid ``2**-snap_bits`` (round half up).
    Float summation is not associative, so two engines (or two
    partitionings) computing the same per-cluster mean can differ in
    the last bits; snapping to a grid ~1e9 coarser than double ulp
    absorbs that divergence, making centroids — and therefore
    assignments — bit-reproducible across engines. This is what lets
    the DuckDB oracle replay Lloyd's exactly (plans/llm.py::q_kmeans).
    """
    cents = kmeans_centroids(df, id_col, vec_col, k, n_iter, snap_bits)
    return _assign_clusters(df, vec_col, cents).select(F.col(id_col), "cluster")


def _assign_clusters(
    df: DataFrame, vec_col: str, cent_list: list[list[float]]
) -> DataFrame:
    """Squared-L2 argmin over the broadcast centroid set
    (``_with_vector_set``) — map-side fold, ties to the lower cluster
    id (shared by training and final assignment so both stay
    bit-reproducible). Adds a ``cluster`` column."""
    init = F.struct(
        F.lit(float("inf")).alias("best"),
        F.lit(-1).cast("int").alias("cid"),
    )
    assign = F.aggregate(
        F.col("__cents"),
        init,
        lambda acc, c: F.when(
            l2sq(F.col(vec_col), c["v"]) < acc["best"],
            F.struct(
                l2sq(F.col(vec_col), c["v"]).alias("best"),
                c["id"].alias("cid"),
            ),
        ).otherwise(acc),
    )["cid"]
    cents = list(enumerate(cent_list))
    return (
        _with_vector_set(df, cents, "__cents", id_type="INT")
        .withColumn("cluster", assign)
        .drop("__cents")
    )


def kmeans_centroids(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    n_iter: int = 5,
    snap_bits: int | None = None,
) -> list[list[float]]:
    """The training loop of :func:`kmeans_lloyd`, returning the final
    centroid list — the trained coarse quantizer to feed
    ``knn_cosine_ivf(anchors=...)`` (FAISS train-then-index shape)."""
    cents: list[list[float]] = [
        [float(x) for x in r[1]]
        for r in df.select(id_col, vec_col).orderBy(id_col).limit(k).collect()
    ]
    for _ in range(n_iter):
        assigned = _assign_clusters(
            df.select(F.col(id_col), F.col(vec_col)), vec_col, cents
        )
        means = (
            assigned.select("cluster", F.posexplode(vec_col).alias("pos", "val"))
            .groupBy("cluster", "pos")
            .agg(F.avg("val").alias("mean"))
            .collect()
        )
        new_cents = [list(c) for c in cents]  # empty clusters keep centroid
        by_cluster: dict[int, dict[int, float]] = {}
        for r in means:
            by_cluster.setdefault(r["cluster"], {})[r["pos"]] = r["mean"]
        if snap_bits is not None:
            grid = float(1 << snap_bits)
            for dims in by_cluster.values():
                for p, v in dims.items():
                    dims[p] = math.floor(v * grid + 0.5) / grid
        for cid, dims in by_cluster.items():
            new_cents[cid] = [dims[p] for p in range(len(dims))]
        cents = new_cents

    return cents
