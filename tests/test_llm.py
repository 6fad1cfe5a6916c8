"""Semantics tests for the LLM-data operators (dedup / similarity /
text analysis / multimodal) beyond the DuckDB hash parity the driver
checks."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pipeline_airflow_docker_spark.catalog import table
from pipeline_airflow_docker_spark.operators.dedup import (
    dedup_exact,
    embedding_dup_pairs,
    minhash_dup_pairs,
    ngram_jaccard_pairs,
    simhash_dup_pairs,
)
from pipeline_airflow_docker_spark.operators.multimodal import (
    resize_media,
    sample_frames,
    attach_binary_payload,
    extract_features,
)
from pipeline_airflow_docker_spark.operators.similarity import knn_cosine
from pipeline_airflow_docker_spark.operators.textstats import lang_id


def test_minhash_recall_vs_exact(spark, sf_dir):
    """LSH candidates must recover every exact-Jaccard pair >= 0.9
    (band collision probability at j=0.9 is ~0.996^)."""
    d = table(spark, sf_dir, "documents")
    exact = {
        (r.id_a, r.id_b)
        for r in ngram_jaccard_pairs(d, "doc_id", "text", threshold=0.9).collect()
    }
    lsh = {
        (r.id_a, r.id_b)
        for r in minhash_dup_pairs(d, "doc_id", "text", threshold=0.9).collect()
    }
    assert exact, "corpus should contain planted near-dups"
    missed = exact - lsh
    assert not missed, f"LSH missed high-similarity pairs: {missed}"


def test_simhash_near_identical_docs_have_low_hamming(spark, sf_dir):
    """Recall direction: docs with Jaccard >= 0.95 must land within
    small SimHash Hamming distance. (Precision is weak by construction
    on this synthetic corpus — all docs share one tiny vocabulary, so
    unrelated token-soup docs can also collide; that is a property of
    the data, not the operator.)"""
    d = table(spark, sf_dir, "documents")
    exact = {
        (r.id_a, r.id_b)
        for r in ngram_jaccard_pairs(d, "doc_id", "text", threshold=0.95).collect()
    }
    assert exact, "corpus should contain planted near-dups"
    found = {
        (r.id_a, r.id_b)
        for r in simhash_dup_pairs(d, "doc_id", "text", max_hamming=6).collect()
    }
    missed = exact - found
    assert len(missed) <= max(1, len(exact) // 5), f"simhash missed: {missed}"


def test_null_text_docs_never_join_and_never_vanish(spark):
    """Degenerate (NULL-text) documents: the LSH band key must be NULL
    (concat_ws would collapse every such doc onto ONE empty-string
    bucket in every band — O(k^2) candidate pairs discarded only at
    the Jaccard verify), and simhash_docs must keep one output row per
    input doc with a NULL hash (explode alone would silently drop the
    doc — a cardinality contract change)."""
    from pipeline_airflow_docker_spark.functions.text import (
        band_keys_int,
        int_shingles,
        minhash_signature_int,
        token_hashes,
        tokens,
    )
    from pipeline_airflow_docker_spark.operators.dedup import simhash_docs

    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, None), (3, None), (4, "")],
        "doc_id LONG, text STRING",
    )
    sig = df.select(
        "doc_id",
        token_hashes(tokens("text")).alias("ih"),
    ).select(
        "doc_id",
        band_keys_int(
            minhash_signature_int(
                F.array_distinct(int_shingles(F.col("ih"), 3))
            )
        ).alias("bands"),
    )
    rows = {r.doc_id: r.bands for r in sig.collect()}
    for null_doc in (2, 3):
        assert rows[null_doc] is None or all(
            b is None for b in rows[null_doc]
        ), f"doc {null_doc} got joinable band keys: {rows[null_doc]}"
    assert all(b is not None for b in rows[1])

    sh = {r.id: r.simhash for r in simhash_docs(df, "doc_id", "text").collect()}
    assert set(sh) == {1, 2, 3, 4}, "every input doc must produce a row"
    assert sh[2] is None and sh[3] is None
    assert sh[1] is not None and sh[4] is not None  # '' splits to ['']

    # Pre-hashed path (round-6 ADVICE): NULL array -> NULL simhash,
    # but an EMPTY array keeps fold semantics -> 0, matching
    # simhash32's fold and the SQL oracle.
    pre = spark.createDataFrame(
        [(1, [0xDEADBEEF, 0x12345678]), (2, None), (3, [])],
        "doc_id LONG, ih ARRAY<LONG>",
    )
    shp = {
        r.id: r.simhash
        for r in simhash_docs(pre, "doc_id", hashes_col="ih").collect()
    }
    assert shp[2] is None, "NULL token-hash array must give NULL simhash"
    assert shp[3] == 0, "EMPTY token-hash array must fold to simhash 0"
    assert shp[1] is not None and shp[1] != 0

    # Same invariant on the STRING n-gram path: NULL text must never
    # become the constant [''] shingle set (it paired every NULL doc
    # with every NULL/empty doc at Jaccard 1.0).
    pairs = ngram_jaccard_pairs(df, "doc_id", "text", n=3, threshold=0.5)
    assert {(r.id_a, r.id_b) for r in pairs.collect()} == set()


def test_dedup_exact_is_deterministic_keep_first(spark):
    df = spark.createDataFrame(
        [(3, "x"), (1, "x"), (2, "x"), (7, "y")], "id LONG, text STRING"
    )
    out = dedup_exact(df, ["text"], order=[F.col("id")]).collect()
    assert {(r.id, r.text) for r in out} == {(1, "x"), (7, "y")}


def test_knn_excludes_self_and_returns_k(spark, sf_dir):
    e = table(spark, sf_dir, "embeddings")
    out = knn_cosine(e.filter(F.col("vec_id") < 5), e, k=5).collect()
    by_q: dict[int, list] = {}
    for r in out:
        assert r.query_id != r.neighbor_id
        assert -1.0001 <= r.cos <= 1.0001
        by_q.setdefault(r.query_id, []).append(r)
    assert all(len(v) == 5 for v in by_q.values())
    for rows in by_q.values():
        ranked = sorted(rows, key=lambda r: r.rank)
        coss = [r.cos for r in ranked]
        assert coss == sorted(coss, reverse=True)


def test_embedding_dup_bucketed_subset_of_exact(spark, sf_dir):
    e = table(spark, sf_dir, "embeddings")
    exact = {
        (r.id_a, r.id_b)
        for r in embedding_dup_pairs(e, "vec_id", "embedding", 0.3, bucketed=False).collect()
    }
    buck = {
        (r.id_a, r.id_b)
        for r in embedding_dup_pairs(e, "vec_id", "embedding", 0.3, bucketed=True).collect()
    }
    assert buck <= exact  # bucketing may miss pairs, never invent them


def test_quadratic_baselines_refuse_past_pair_ceiling(spark, sf_dir):
    """The all-pairs baselines must fail LOUDLY past their pair budget
    (the round-6 sf1.0 sweep proved the alternative: 20 k vectors →
    BroadcastNestedLoop → dead JVM). The error must name the blocked
    scale path, the bucketed/LSH paths must never trip the guard, and
    max_pairs=None must disable it for callers who accept the cost."""
    e = table(spark, sf_dir, "embeddings")
    d = table(spark, sf_dir, "documents")

    with pytest.raises(ValueError, match="sign-LSH"):
        embedding_dup_pairs(
            e, "vec_id", "embedding", 0.3, bucketed=False, max_pairs=10
        )
    with pytest.raises(ValueError, match="minhash_dup_pairs"):
        ngram_jaccard_pairs(
            d, "doc_id", "text", threshold=0.9, block_col="lang", max_pairs=10
        )

    # Bucketed path: guard never runs, even with an absurd ceiling.
    assert (
        embedding_dup_pairs(
            e, "vec_id", "embedding", 0.3, bucketed=True, max_pairs=0
        ).count()
        >= 0
    )
    # Opt-out: None disables the guard on the quadratic path.
    assert (
        embedding_dup_pairs(
            e.limit(20), "vec_id", "embedding", 0.3, bucketed=False, max_pairs=None
        ).count()
        >= 0
    )

    # NULL-block rows never satisfy the equi-join, so they must not
    # count toward the refusal estimate: 50 NULL-lang docs would be
    # 1225 "pairs" if miscounted, but the only real block has 2 docs
    # = 1 pair, under the ceiling of 5.
    nulls = spark.createDataFrame(
        [(i, "t %d" % i, None) for i in range(50)]
        + [(100, "same text", "en"), (101, "same text", "en")],
        "doc_id LONG, text STRING, lang STRING",
    )
    assert (
        ngram_jaccard_pairs(
            nulls, "doc_id", "text", threshold=0.9, block_col="lang", max_pairs=5
        ).count()
        >= 0
    )

    # Estimate-overflow contract (r11 ADVICE): if the DECIMAL(38,0)
    # pair sum itself overflows (>= 1e38 pairs), non-ANSI Spark
    # returns a NULL estimate — the guard must REFUSE, never coalesce
    # to 0 and pass on exactly the input it exists to refuse. The
    # sentinel path is unit-testable; the real overflow needs ~1e19
    # rows per block.
    from pipeline_airflow_docker_spark.operators.dedup import (  # noqa: PLC0415
        _check_pair_budget,
    )

    with pytest.raises(ValueError, match="overflowed"):
        _check_pair_budget(None, 10_000_000, "ngram_jaccard_pairs", "x")


def test_multimodal_real_decode_raises(spark, sf_dir):
    d = table(spark, sf_dir, "documents").limit(2)
    feats = extract_features(attach_binary_payload(d), fake=False)
    with pytest.raises(Exception, match="NotImplementedError|no codec"):
        feats.collect()


def test_multimodal_fake_features_deterministic(spark, sf_dir):
    d = table(spark, sf_dir, "documents").limit(20)
    out = extract_features(attach_binary_payload(d), n_features=8, fake=True)
    rows = {r.doc_id: r for r in out.collect()}
    again = {r.doc_id: r for r in out.collect()}
    assert rows.keys() == again.keys()
    for k in rows:
        assert rows[k].feature == again[k].feature
        assert abs(sum(rows[k].feature) - 1.0) < 1e-9
        assert rows[k].n_bytes > 0


def test_sample_frames_covers_all_bytes_every_kth(spark, sf_dir):
    """Fake frame sampling: every 4th 64-byte window, frame_idx dense
    in the sampled sequence, frames reassemble the right byte ranges."""
    d = table(spark, sf_dir, "documents").limit(5)
    src = {r.doc_id: r.text.encode() for r in d.collect()}
    frames = sample_frames(
        attach_binary_payload(d), frame_size=64, every_k=4, fake=True
    ).collect()
    by_doc: dict[int, list] = {}
    for r in frames:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert by_doc.keys() == src.keys()
    for doc_id, rows in by_doc.items():
        rows.sort(key=lambda r: r.frame_idx)
        assert [r.frame_idx for r in rows] == list(range(len(rows)))
        for r in rows:
            start = r.frame_idx * 4 * 64
            assert bytes(r.frame) == src[doc_id][start : start + 64]


def test_resize_media_strides_bytes(spark, sf_dir):
    d = table(spark, sf_dir, "documents").limit(5)
    src = {r.doc_id: r.text.encode() for r in d.collect()}
    out = resize_media(attach_binary_payload(d), factor=4, fake=True).collect()
    assert {r.doc_id for r in out} == src.keys()
    for r in out:
        assert bytes(r.resized) == src[r.doc_id][::4]
        assert r.orig_bytes == len(src[r.doc_id])


def test_frame_and_resize_real_decode_raises(spark, sf_dir):
    d = table(spark, sf_dir, "documents").limit(1)
    for op in (sample_frames, resize_media):
        with pytest.raises(Exception, match="NotImplementedError|no codec"):
            op(attach_binary_payload(d), fake=False).collect()


def test_lang_id_schema_and_fallback(spark):
    df = spark.createDataFrame(
        [(1, "the cat and the dog"), (2, "der hund und die katze"), (3, "zzz qqq")],
        "doc_id LONG, text STRING",
    )
    out = {r.doc_id: r.pred_lang for r in lang_id(df).collect()}
    assert out[1] == "en" and out[2] == "de" and out[3] == "und"


def test_knn_ivf_recall_vs_exact(spark, sf_dir):
    """IVF with 2-of-8 probes must still recover most exact top-3
    neighbors on this corpus, and every returned pair must carry the
    exact cosine (IVF approximates the candidate set, never the
    score)."""
    from pipeline_airflow_docker_spark.operators.similarity import knn_cosine_ivf

    e = table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 10)
    exact = {
        (r.query_id, r.neighbor_id): r.cos
        for r in knn_cosine(q, e, k=3).collect()
    }
    ivf = {
        (r.query_id, r.neighbor_id): r.cos
        for r in knn_cosine_ivf(q, e, k=3, n_anchors=8, n_probe=2).collect()
    }
    hits = set(exact) & set(ivf)
    recall = len(hits) / len(exact)
    assert recall >= 0.5, f"IVF recall collapsed: {recall:.2f}"
    for pair in hits:  # scores are exact wherever the candidate was probed
        assert abs(exact[pair] - ivf[pair]) < 1e-12


def test_knn_ivf_corpus_side_has_no_shuffle(spark, sf_dir):
    """Cell assignment must be map-side: no Exchange between the
    corpus parquet scan and the probe join (the only exchanges allowed
    are for the tiny query side and the final per-query top-k
    window)."""
    from pipeline_airflow_docker_spark.operators.similarity import knn_cosine_ivf

    e = table(spark, sf_dir, "embeddings")
    plan = knn_cosine_ivf(
        e.filter(F.col("vec_id") < 10), e, k=3
    )._jdf.queryExecution().executedPlan().toString()
    # corpus -> BroadcastHashJoin must not pass through an Exchange:
    # the join's streamed side is the scan itself.
    joins = [ln for ln in plan.splitlines() if "BroadcastHashJoin" in ln]
    assert joins, plan
    # Every shuffle Exchange must partition on the *query* side
    # (query_id for the top-k window / probe ranking); a shuffle of the
    # corpus branch (e.g. hashpartitioning on cell or corpus vec_id)
    # would mean cell assignment stopped being map-side.
    shuffles = [
        ln
        for ln in plan.splitlines()
        if "Exchange hashpartitioning" in ln
    ]
    for ln in shuffles:
        assert "query_id" in ln, f"corpus-side shuffle detected:\n{ln}\n{plan}"


def test_knn_ivf_plan_size_constant_in_anchors(spark, sf_dir):
    """The coarse quantizer travels in a broadcast exchange, not the
    expression tree: an 8x bigger anchor set may not grow the
    serialized plan (ADVICE r03 flagged the old literal-array form,
    O(k*dim) per task)."""
    from pipeline_airflow_docker_spark.operators.similarity import knn_cosine_ivf

    e = table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 10)

    def plan_chars(n_anchors):
        df = knn_cosine_ivf(q, e, k=3, n_anchors=n_anchors, n_probe=2)
        qe = df._jdf.queryExecution()
        return len(qe.optimizedPlan().toString()) + len(
            qe.executedPlan().toString()
        )

    small, big = plan_chars(4), plan_chars(32)
    assert big <= small * 1.10, (small, big)


def test_chunk_tokens_coverage_and_overlap(spark):
    """Every token appears in >= 1 chunk; consecutive chunks overlap by
    window-stride tokens; short docs yield exactly one short chunk."""
    from pipeline_airflow_docker_spark.operators.chunking import chunk_tokens

    docs = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(95))), (2, "a b c")],
        "doc_id BIGINT, text STRING",
    )
    out = chunk_tokens(docs, "text", window=50, stride=40)
    rows = {(r.doc_id, r.chunk_id): r for r in out.collect()}
    # doc 1: 95 tokens -> ceil((95-50)/40)+1 = 3 chunks
    assert {k for k in rows if k[0] == 1} == {(1, 0), (1, 1), (1, 2)}
    c0, c1, c2 = (rows[(1, i)].chunk_text.split(" ") for i in range(3))
    assert c0 == [f"t{i}" for i in range(50)]
    assert c1[:10] == c0[40:]          # 10-token overlap
    assert c2 == [f"t{i}" for i in range(80, 95)]  # short tail kept
    assert rows[(1, 2)].n_tokens == 15
    # doc 2: shorter than one window -> single chunk, whole doc
    assert rows[(2, 0)].chunk_text == "a b c" and rows[(2, 0)].n_tokens == 3
    assert len([k for k in rows if k[0] == 2]) == 1


def test_chunk_tokens_rejects_bad_stride(spark):
    from pipeline_airflow_docker_spark.operators.chunking import chunk_tokens

    docs = spark.createDataFrame([(1, "a b")], "doc_id BIGINT, text STRING")
    with pytest.raises(ValueError):
        chunk_tokens(docs, "text", window=10, stride=0)
    with pytest.raises(ValueError):
        chunk_tokens(docs, "text", window=10, stride=11)


def test_chunk_tokens_delimiter_is_literal_not_regex(spark):
    """Red fence (r12): Spark's split() is regex-based, so the
    operator must Pattern-quote the caller's delimiter — an unquoted
    '.' splits on every character and '|' on every position, silently
    producing garbage chunks."""
    from pipeline_airflow_docker_spark.operators.chunking import chunk_tokens

    docs = spark.createDataFrame(
        [(1, "a.b.c.d"), (2, "x|y|z"), (3, r"a\Eb\Ec")],
        "doc_id BIGINT, text STRING",
    )
    dots = chunk_tokens(
        docs.filter("doc_id = 1"), "text", window=2, stride=2, delimiter="."
    ).collect()
    assert [(r.chunk_id, r.n_tokens, r.chunk_text) for r in dots] == [
        (0, 2, "a.b"),
        (1, 2, "c.d"),
    ]
    pipes = chunk_tokens(
        docs.filter("doc_id = 2"), "text", window=2, stride=2, delimiter="|"
    ).collect()
    assert [(r.n_tokens, r.chunk_text) for r in pipes] == [(2, "x|y"), (1, "z")]
    # the \Q..\E quoting's own escape hatch: a delimiter CONTAINING \E
    esc = chunk_tokens(
        docs.filter("doc_id = 3"), "text", window=5, stride=5, delimiter="\\E"
    ).collect()
    assert [(r.n_tokens, r.chunk_text) for r in esc] == [(3, "a\\Eb\\Ec")]


def test_hash_split_stable_and_proportional(spark, sf_dir):
    """Split membership is a pure function of the key: unchanged when
    the corpus shrinks/grows, and close to the target fractions."""
    from pipeline_airflow_docker_spark.operators.splits import hash_split

    d = table(spark, sf_dir, "documents").select("doc_id")
    full = {r.doc_id: r.split for r in hash_split(d, "doc_id").collect()}
    n = len(full)
    frac_train = sum(1 for v in full.values() if v == "train") / n
    assert 0.7 < frac_train < 0.9
    assert set(full.values()) == {"train", "val", "test"}
    # subset of the corpus -> identical assignments for surviving keys
    sub = {
        r.doc_id: r.split
        for r in hash_split(d.filter("doc_id % 3 = 0"), "doc_id").collect()
    }
    assert all(full[k] == v for k, v in sub.items())
    # different seed -> different deal
    reseeded = {r.doc_id: r.split for r in hash_split(d, "doc_id", seed=7).collect()}
    assert reseeded != full


def test_hash_split_rejects_bad_fractions(spark):
    from pipeline_airflow_docker_spark.operators.splits import hash_split

    d = spark.createDataFrame([(1,)], "doc_id BIGINT")
    with pytest.raises(ValueError):
        hash_split(d, "doc_id", {"train": 0.5, "test": 0.4})


def test_resolve_components_chain_and_singletons(spark):
    """Transitive closure: a chain 1-2-3 collapses to component 1 even
    though (1,3) was never emitted as a pair; untouched nodes keep
    themselves; pair order (a<b vs b<a) doesn't matter."""
    from pipeline_airflow_docker_spark.operators.dedup import resolve_components

    nodes = spark.createDataFrame([(i,) for i in range(1, 7)], "doc_id BIGINT")
    pairs = spark.createDataFrame(
        [(1, 2), (3, 2), (5, 6)], "id_a BIGINT, id_b BIGINT"
    )
    got = {
        r.id: r.component
        for r in resolve_components(nodes, pairs, id_col="doc_id").collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 4, 5: 5, 6: 5}


def test_resolve_components_no_pairs_is_identity(spark):
    from pipeline_airflow_docker_spark.operators.dedup import resolve_components

    nodes = spark.createDataFrame([(i,) for i in range(3)], "doc_id BIGINT")
    pairs = spark.createDataFrame([], "id_a BIGINT, id_b BIGINT")
    got = {
        r.id: r.component
        for r in resolve_components(nodes, pairs, id_col="doc_id").collect()
    }
    assert got == {0: 0, 1: 1, 2: 2}


def test_clean_corpus_drops_low_quality_and_dups(spark):
    from pipeline_airflow_docker_spark.operators.corpus import clean_corpus

    rich = (
        "the quick brown fox jumps over one lazy dog while seventeen "
        "sparrows debate quantum economics beneath flowering chestnut trees "
        "and distant ships signal across the harbor carrying spice cargo"
    )
    near_dup = rich + " tonight"
    junk = "the the the the the"
    docs = spark.createDataFrame(
        [(1, rich), (2, near_dup), (3, junk), (10, "completely different words "
          "about mountaineering routes with crampons ropes carabiners and "
          "alpine weather forecasting models for winter expedition planning")],
        "doc_id BIGINT, text STRING",
    )
    out = {r.doc_id: r.split for r in clean_corpus(docs, quality_min=0.3).collect()}
    assert 3 not in out          # low quality gone
    assert 2 not in out and 1 in out  # dup cluster keeps min id
    assert 10 in out             # unrelated doc survives
    assert set(out.values()) <= {"train", "val", "test"}


def test_clean_corpus_exact_collapse_is_result_identical(spark):
    """The exact-collapse prepass (collapse byte-identical texts to
    their min-id copy before LSH) must be a pure plan optimization:
    identical keep-set with it on and off, while the LSH stage sees
    quadratically fewer candidate pairs on an identical-doc clique."""
    from pipeline_airflow_docker_spark.operators.corpus import clean_corpus

    rich = (
        "the quick brown fox jumps over one lazy dog while seventeen "
        "sparrows debate quantum economics beneath flowering chestnut trees "
        "and distant ships signal across the harbor carrying spice cargo"
    )
    boiler = (
        "standard legal boilerplate paragraph governing limitation of "
        "liability indemnification severability waiver amendments notices "
        "assignment entire agreement and governing law for every contract"
    )
    rows = (
        # a 6-doc byte-identical clique (the quadratic pocket)
        [(i, boiler) for i in range(1, 7)]
        # a genuine near-dup pair that must still be found post-collapse
        + [(7, rich), (8, rich + " tonight")]
        # NULL texts: dropped by the quality gate, never merged by the
        # collapse (groupBy would treat NULL keys as equal)
        + [(9, None), (10, None)]
        + [(11, "completely different words about mountaineering routes "
                "with crampons ropes carabiners and alpine weather "
                "forecasting models for winter expedition planning")]
    )
    docs = spark.createDataFrame(rows, "doc_id BIGINT, text STRING")
    res = {
        mode: sorted(
            (r.doc_id, r.quality, r.split)
            for r in clean_corpus(
                docs, quality_min=0.3, collapse_exact=mode
            ).collect()
        )
        for mode in (True, False)
    }
    assert res[True] == res[False]
    kept_ids = {t[0] for t in res[True]}
    assert kept_ids == {1, 7, 11}  # min-id per cluster, near-dup folded

    # The perf claim: the clique contributes C(6,2)=15 verified pairs
    # uncollapsed and ZERO after collapse (one representative left).
    pairs_raw = minhash_dup_pairs(docs, "doc_id", "text", threshold=0.8)
    clique_raw = pairs_raw.filter(F.col("id_a") <= 6).filter(F.col("id_b") <= 6)
    assert clique_raw.count() == 15
    collapsed = dedup_exact(
        docs.filter(F.col("text").isNotNull()), ["text"], order=[F.col("doc_id")]
    )
    pairs_col = minhash_dup_pairs(collapsed, "doc_id", "text", threshold=0.8)
    assert pairs_col.filter(F.col("id_b") <= 6).count() == 0


def test_redact_pii_patterns_and_counts(spark):
    from pipeline_airflow_docker_spark.operators.redact import redact_pii

    docs = spark.createDataFrame(
        [
            (1, "mail me at jane.doe+x@example.co.uk or call +1 (555) 123-4567"),
            (2, "server 192.168.0.1 leaked ssn 123-45-6789 yesterday"),
            (3, "no pii here at all"),
        ],
        "doc_id BIGINT, text STRING",
    )
    out = {r.doc_id: r for r in redact_pii(docs).collect()}
    assert "<EMAIL>" in out[1].text and "<PHONE>" in out[1].text
    assert "jane" not in out[1].text and "555" not in out[1].text
    assert "<IPV4>" in out[2].text and "<SSN>" in out[2].text
    assert out[2].n_pii == 2
    assert out[3].text == "no pii here at all" and out[3].n_pii == 0


def test_stratified_downsample_caps_and_is_stable(spark):
    from pipeline_airflow_docker_spark.operators.splits import (
        stratified_downsample,
    )

    rows = [(i, "big" if i < 90 else "small") for i in range(100)]
    df = spark.createDataFrame(rows, "k BIGINT, grp STRING")
    out = stratified_downsample(df, "grp", 5, key_col="k")
    counts = {r.grp: r.n for r in out.groupBy("grp").agg(F.count("*").alias("n")).collect()}
    assert counts == {"big": 5, "small": 5}
    # deterministic: same keys kept on re-run and under a different partitioning
    a = sorted(r.k for r in out.collect())
    b = sorted(r.k for r in stratified_downsample(df.repartition(7), "grp", 5, key_col="k").collect())
    assert a == b


def test_tfidf_rare_terms_outrank_common(spark):
    from pipeline_airflow_docker_spark.operators.textstats import tfidf_top_terms

    docs = spark.createDataFrame(
        [
            (1, "shared zebra zebra"),
            (2, "shared yak yak"),
            (3, "shared wombat wombat"),
        ],
        "doc_id BIGINT, text STRING",
    )
    out = tfidf_top_terms(docs, k=1).collect()
    # 'shared' appears in every doc (idf floor = 1, tfidf = 1); each
    # doc's unique animal has tf=2 and idf ln(2)+1, so it must win.
    assert {(r.doc_id, r.term) for r in out} == {(1, "zebra"), (2, "yak"), (3, "wombat")}


def test_kmeans_matches_numpy_reference(spark, sf_dir):
    """Distributed Lloyd's must reproduce a straightforward numpy
    Lloyd's exactly: same deterministic init (k lowest ids), same
    squared-L2 argmin with ties to the lower cluster, same fixed
    iteration count."""
    import numpy as np

    from pipeline_airflow_docker_spark.operators.similarity import kmeans_lloyd

    e = table(spark, sf_dir, "embeddings")
    rows = sorted(
        ((r.vec_id, np.array(r.embedding, dtype=np.float64)) for r in e.collect()),
        key=lambda t: t[0],
    )
    ids = [t[0] for t in rows]
    X = np.stack([t[1] for t in rows])
    k, n_iter = 4, 3
    cents = X[:k].copy()
    for _ in range(n_iter):
        d = ((X[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        labels = d.argmin(axis=1)  # argmin takes first (lowest cid) on ties
        for c in range(k):
            if (labels == c).any():
                cents[c] = X[labels == c].mean(axis=0)
    d = ((X[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    want = dict(zip(ids, d.argmin(axis=1)))

    got = {r.vec_id: r.cluster for r in kmeans_lloyd(e, k=k, n_iter=n_iter).collect()}
    mismatches = {i for i in want if want[i] != got[i]}
    # float-sum order differs (sequential fold vs numpy pairwise), so
    # points equidistant-within-ulp may flip; demand >=99% agreement
    # and identical cluster usage.
    assert len(mismatches) <= max(1, len(ids) // 100), mismatches
    assert set(got.values()) == set(int(x) for x in want.values())


def test_kmeans_degenerate_vectors_get_sentinel_cluster(spark):
    """NULL / wrong-dimension vectors must neither crash training nor
    silently join a cluster: they come back with cluster -1 (the
    graded qkey filters them out up front; the operator stays safe on
    raw corpora)."""
    import numpy as np

    from pipeline_airflow_docker_spark.operators.similarity import kmeans_lloyd

    rng = np.random.RandomState(7)
    rows = [(i, rng.rand(8).tolist()) for i in range(20)]
    rows += [(100, None), (101, [])]
    df = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<DOUBLE>")
    got = {r.vec_id: r.cluster for r in kmeans_lloyd(df, k=3, n_iter=2).collect()}
    assert len(got) == 22
    assert got[100] == -1 and got[101] == -1
    assert all(0 <= c < 3 for i, c in got.items() if i < 100)


def test_pack_sequences_layout(spark):
    """Concat-and-cut: offsets advance by token counts, wrap at
    seq_len, and packing depends only on the deterministic order."""
    from pipeline_airflow_docker_spark.operators.packing import pack_sequences

    rows = [(i, 30) for i in range(10)]  # 300 tokens total
    df = spark.createDataFrame(rows, "doc_id int, n_tokens int")
    out = pack_sequences(df, "n_tokens", 100, order_cols=("doc_id",))
    got = {r.doc_id: (r.pack_id, r.pack_offset) for r in out.collect()}
    # doc 0 starts at 0; doc 3 starts at 90 (pack 0, offset 90) and
    # straddles into pack 1; doc 4 starts at 120 -> pack 1 offset 20.
    assert got[0] == (0, 0)
    assert got[3] == (0, 90)
    assert got[4] == (1, 20)
    assert got[9] == (2, 70)
    with pytest.raises(ValueError):
        pack_sequences(df, "n_tokens", 0)
    # r12 ADVICE: a non-integral seq_len would silently use int(x) in
    # the pack_id `div` but the raw value in the pack_offset `%` —
    # two different denominators. Rejected at the door.
    with pytest.raises(TypeError):
        pack_sequences(df, "n_tokens", 256.5)
    with pytest.raises(TypeError):
        pack_sequences(df, "n_tokens", True)
    # r13 ADVICE: non-builtin integral types (numpy.int64 from a
    # computed config) are fine — Integral accepted, normalized to int
    # so the div and % denominators stay identical.
    import numpy as np

    np_out = pack_sequences(
        df, "n_tokens", np.int64(100), order_cols=("doc_id",)
    )
    got_np = {r.doc_id: (r.pack_id, r.pack_offset) for r in np_out.collect()}
    assert got_np == got


def test_pack_sequences_pack_id_is_bigint(spark):
    """Red fence (r12, the global_row_index int32 class): pack_id is
    cumulative-tokens // seq_len — trillions of tokens in one coarse
    part_cols group at corpus scale — so it must be LongType and the
    arithmetic must hold past 2^31. The pre-r12 ``.cast("int")`` shape
    wraps the third doc's pack_id (2^32) to 0 under ansi.enabled=false.
    pack_offset stays INT (bounded below seq_len by construction)."""
    from pyspark.sql.types import IntegerType, LongType

    from pipeline_airflow_docker_spark.operators.packing import pack_sequences

    big = 2**33  # tokens per doc, so doc 3 starts at 2^34
    rows = [(1, big), (2, big), (3, big)]
    df = spark.createDataFrame(rows, "doc_id int, n_tokens long")
    out = pack_sequences(df, "n_tokens", 4, order_cols=("doc_id",))
    assert isinstance(out.schema["pack_id"].dataType, LongType)
    assert isinstance(out.schema["pack_offset"].dataType, IntegerType)
    got = {r.doc_id: r.pack_id for r in out.collect()}
    assert got == {1: 0, 2: 2**31, 3: 2**32}
    wrapped = {
        r.doc_id: r.pack_id
        for r in out.select(
            "doc_id", F.col("pack_id").cast("int").alias("pack_id")
        ).collect()
    }
    assert wrapped[3] == 0, (
        "int32 cast no longer wraps — if Spark semantics changed, "
        "re-evaluate whether this fence is still needed"
    )


def test_pack_sequences_exact_division_past_2_52(spark):
    """Red fence (r12): the cut must use exact integer division.
    floor(start / seq_len) goes through DOUBLE division, which rounds
    ACROSS integer boundaries past ~2^52 cumulative tokens —
    floor((2^54-1)/4) = 2^52 in IEEE double, one pack too far, in
    both engines identically (so parity could never catch it)."""
    from pipeline_airflow_docker_spark.operators.packing import pack_sequences

    big = 2**54 - 1  # = 4k - 1; true (big div 4) = 2^52 - 1
    rows = [(1, big), (2, 10)]
    df = spark.createDataFrame(rows, "doc_id int, n_tokens long")
    out = pack_sequences(df, "n_tokens", 4, order_cols=("doc_id",))
    got = {r.doc_id: (r.pack_id, r.pack_offset) for r in out.collect()}
    assert got[2] == (2**52 - 1, 3)
    # Discriminator: the double-division shape is off by one here.
    wrong = df.select(F.floor(F.lit(big) / 4).alias("f")).collect()[0].f
    assert wrong == 2**52, (
        "floor(double) division is exact now — if Spark changed `/` "
        "semantics on longs, this fence can be re-evaluated"
    )


def test_pack_sequences_partition_isolation(spark):
    """part_cols pack independently: each group restarts at pack 0."""
    from pipeline_airflow_docker_spark.operators.packing import pack_sequences

    rows = [("en", 1, 60), ("en", 2, 60), ("de", 1, 60)]
    df = spark.createDataFrame(rows, "lang string, doc_id int, n_tokens int")
    out = pack_sequences(
        df, "n_tokens", 100, part_cols=("lang",), order_cols=("doc_id",)
    )
    got = {(r.lang, r.doc_id): (r.pack_id, r.pack_offset) for r in out.collect()}
    assert got[("en", 1)] == (0, 0)
    assert got[("en", 2)] == (0, 60)
    assert got[("de", 1)] == (0, 0)


def test_decontaminate_drops_overlapping_docs(spark):
    """A corpus doc sharing a 3-gram with the benchmark is dropped;
    disjoint docs survive."""
    from pipeline_airflow_docker_spark.operators.decontam import decontaminate

    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "completely unrelated words appear here only"),
        ],
        "doc_id int, text string",
    )
    bench = spark.createDataFrame(
        [(100, "quick brown fox puzzles researchers")], "doc_id int, text string"
    )
    kept = {r.doc_id for r in decontaminate(corpus, bench, "doc_id", "text").collect()}
    assert kept == {2}


def test_decontaminate_benchmark_side_broadcasts(spark, sf_dir):
    """Scale shape: the benchmark shingle join must broadcast the
    benchmark side — the 100 TB corpus never shuffles for the probe."""
    d = table(spark, sf_dir, "documents")
    from pipeline_airflow_docker_spark.operators.decontam import decontaminate

    out = decontaminate(
        d.filter(F.col("doc_id") % 97 != 0),
        d.filter(F.col("doc_id") % 97 == 0),
        "doc_id",
        "text",
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_repetition_stats_flags_looping_text(spark):
    from pipeline_airflow_docker_spark.operators.textstats import repetition_stats

    df = spark.createDataFrame(
        [
            (1, "spam spam spam spam spam spam spam spam"),
            (2, "all these tokens differ from one another entirely"),
        ],
        "doc_id int, text string",
    )
    got = {r.doc_id: r for r in repetition_stats(df).collect()}
    assert not got[1].keep and got[1].top_gram_frac == 1.0
    assert got[2].keep and got[2].dup_gram_frac == 0.0


def test_quantize_int8_bounds_and_roundtrip(spark):
    """Quantized elements stay in [-127,127]; dequantized error is at
    most scale/2 per element; zero vectors are safe."""
    from pipeline_airflow_docker_spark.operators.embeddings import (
        l2_normalize,
        quantize_int8,
    )

    df = spark.createDataFrame(
        [(1, [0.5, -1.0, 0.25]), (2, [0.0, 0.0, 0.0])],
        "vec_id int, embedding array<float>",
    )
    got = {r.vec_id: r for r in quantize_int8(df).collect()}
    q1, s1 = got[1].q, got[1].scale
    assert all(-127 <= x <= 127 for x in q1)
    for orig, qv in zip([0.5, -1.0, 0.25], q1):
        assert abs(qv * s1 - orig) <= s1 / 2 + 1e-12
    assert got[2].q == [0, 0, 0] and got[2].scale == 0.0

    unit = {r.vec_id: r.unit for r in l2_normalize(df).collect()}
    assert abs(sum(x * x for x in unit[1]) - 1.0) < 1e-9
    assert unit[2] == [0.0, 0.0, 0.0]


def test_minhash_incremental_drops_cross_batch_dups(spark):
    """A new doc nearly identical to a corpus doc is dropped; a fresh
    doc survives; corpus rows are never returned."""
    from pipeline_airflow_docker_spark.operators.dedup import minhash_incremental

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    corpus = spark.createDataFrame(
        [(0, base), (2, "totally different corpus content here")],
        "doc_id int, text string",
    )
    new = spark.createDataFrame(
        [(1, base + " lambda"), (3, "brand new unique never seen text")],
        "doc_id int, text string",
    )
    kept = {
        r.doc_id
        for r in minhash_incremental(new, corpus, "doc_id", "text").collect()
    }
    assert kept == {3}


def test_semdedup_keeps_min_id_per_cluster(spark):
    """Two co-bucketed near-identical vectors collapse to one keep
    (min id); an orthogonal vector survives as its own component."""
    from pipeline_airflow_docker_spark.operators.dedup import (
        embedding_dup_pairs,
        resolve_components,
    )

    df = spark.createDataFrame(
        [
            (1, [1.0, 0.1, 0.1, 0.1]),
            (2, [1.0, 0.1, 0.1, 0.2]),   # near-dup of 1, same sign bucket
            (3, [-1.0, -1.0, 0.5, 0.5]),  # different bucket entirely
        ],
        "vec_id int, embedding array<float>",
    )
    pairs = embedding_dup_pairs(
        df, "vec_id", "embedding", threshold=0.9, bucketed=True, n_bits=4
    ).select("id_a", "id_b")
    comp = {
        r.id: r.component
        for r in resolve_components(
            df.select("vec_id"), pairs, id_col="vec_id"
        ).collect()
    }
    assert comp == {1: 1, 2: 1, 3: 3}


def test_mix_corpora_rates_and_determinism(spark, sf_dir):
    """C17: membership is a pure function of (key, seed) — rerunning
    gives byte-identical selection; rate 1.0 keeps everything; rates
    land near target in expectation."""
    from pipeline_airflow_docker_spark.operators.splits import mix_corpora

    d = table(spark, sf_dir, "documents").select("doc_id", "source")
    full = d.count()
    out = mix_corpora({"all": (d, 1.0)}, key_col="doc_id")
    assert out.count() == full

    mixed = mix_corpora({"a": (d, 0.5), "b": (d, 0.25)}, key_col="doc_id")
    again = mix_corpora({"a": (d, 0.5), "b": (d, 0.25)}, key_col="doc_id")
    rows = sorted((r.doc_id, r.corpus) for r in mixed.collect())
    assert rows == sorted((r.doc_id, r.corpus) for r in again.collect())
    n_a = sum(1 for _, c in rows if c == "a")
    n_b = sum(1 for _, c in rows if c == "b")
    assert abs(n_a / full - 0.5) < 0.12 and abs(n_b / full - 0.25) < 0.12
    # same seed => corpus b's selection is a subset of corpus a's
    ids_a = {i for i, c in rows if c == "a"}
    ids_b = {i for i, c in rows if c == "b"}
    assert ids_b <= ids_a

    import pytest as _pytest

    with _pytest.raises(ValueError, match="rate"):
        mix_corpora({"bad": (d, 1.5)}, key_col="doc_id")

    # A validated-nonzero rate must never silently select zero rows:
    # 0.0004 would round() to bucket bound 0 — the floor keeps bucket
    # 0 (≡ rate 0.001), i.e. ~1/1000 of a corpus big enough to hit it.
    big = spark.range(20000).withColumnRenamed("id", "doc_id")
    tiny = mix_corpora({"t": (big, 0.0004)}, key_col="doc_id")
    floor_sel = tiny.count()
    assert 0 < floor_sel < 20000 * 0.01
    assert floor_sel == mix_corpora({"t": (big, 0.001)}, key_col="doc_id").count()


def test_write_training_shards_layout(spark, sf_dir, tmp_path):
    """C18: shard=<k> directories, every row present exactly once,
    assignment content-addressed, within-shard order stable."""
    import os

    from pipeline_airflow_docker_spark.operators.splits import (
        shard_assign,
        write_training_shards,
    )

    d = table(spark, sf_dir, "documents").select("doc_id", "lang")
    out = str(tmp_path / "shards")
    write_training_shards(d, out, "doc_id", n_shards=8, sort_cols=["doc_id"])

    dirs = {p for p in os.listdir(out) if p.startswith("shard=")}
    assert dirs == {f"shard={k}" for k in range(8)}

    back = spark.read.parquet(out)
    assert back.count() == d.count()
    want = {
        (r.doc_id, r.shard)
        for r in shard_assign(d, "doc_id", 8).select("doc_id", "shard").collect()
    }
    got = {(r.doc_id, r.shard) for r in back.collect()}
    assert got == want


def test_segment_boilerplate_removal_drops_shared_segments(spark):
    """C19: a segment appearing in two docs is removed from both;
    unique segments survive in original order."""
    from pipeline_airflow_docker_spark.operators.dedup import (
        segment_boilerplate_removal,
    )

    boiler = "x " * 9 + "x"  # one exact 10-token segment
    rows = [
        (1, boiler + " alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (2, boiler + " one two three four five six seven eight nine ten"),
        (3, "solo doc with its own words only here nothing shared at"),
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    out = {
        r.doc_id: (r.text_clean, r.n_kept)
        for r in segment_boilerplate_removal(
            df, "doc_id", "text", seg_tokens=10, min_docs=2
        ).collect()
    }
    assert out[1] == ("alpha beta gamma delta epsilon zeta eta theta iota kappa", 1)
    assert out[2] == ("one two three four five six seven eight nine ten", 1)
    assert out[3][1] == 2  # 11 tokens -> 2 segments, both unique


def test_training_shards_prune_on_read(spark, sf_dir, tmp_path):
    """The partitionBy(shard) layout must give readers partition
    pruning: a shard filter lands in PartitionFilters, not a post-scan
    Filter — the dataloader-worker benefit the layout exists for."""
    from pipeline_airflow_docker_spark.operators.splits import (
        write_training_shards,
    )

    d = table(spark, sf_dir, "documents").select("doc_id", "lang")
    out = str(tmp_path / "shards")
    write_training_shards(d, out, "doc_id", n_shards=4, sort_cols=["doc_id"])
    pruned = spark.read.parquet(out).filter(F.col("shard") == 2)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "shard" in plan.split("PartitionFilters", 1)[1][:160]


def test_shuffled_order_is_total_permutation(spark, sf_dir):
    """(shard, pos) is a total order: pos is dense 1..n within every
    shard, every row gets exactly one coordinate, and the assignment
    reproduces run-to-run (content-addressed)."""
    from pipeline_airflow_docker_spark.operators.splits import shuffled_order

    d = table(spark, sf_dir, "documents").select("doc_id")
    out = shuffled_order(d, "doc_id", n_shards=8).collect()
    assert len(out) == d.count()
    by_shard: dict[int, list[int]] = {}
    for r in out:
        by_shard.setdefault(r.shard, []).append(r.pos)
    assert set(by_shard) <= set(range(8))
    for shard, ps in by_shard.items():
        assert sorted(ps) == list(range(1, len(ps) + 1)), f"shard {shard} not dense"
    again = shuffled_order(d, "doc_id", n_shards=8).collect()
    assert sorted((r.doc_id, r.shard, r.pos) for r in out) == sorted(
        (r.doc_id, r.shard, r.pos) for r in again
    )
    # within-shard order differs from plain key order (it IS shuffled)
    first_shard = min(by_shard)
    ordered = [
        r.doc_id
        for r in sorted(out, key=lambda r: (r.shard, r.pos))
        if r.shard == first_shard
    ]
    assert ordered != sorted(ordered)


def test_grouped_split_never_leaks_across_sources(spark, sf_dir):
    """Leakage-safe split: hashing the GROUP column sends every doc of
    a source to exactly one split (near-dups cluster within sources;
    doc-keyed splits would put them on both sides of train/eval)."""
    from pipeline_airflow_docker_spark.operators.splits import hash_split

    d = table(spark, sf_dir, "documents").select("doc_id", "source")
    out = hash_split(d, "source")
    per_source = (
        out.groupBy("source")
        .agg(F.countDistinct("split").alias("n_splits"))
        .collect()
    )
    assert per_source and all(r.n_splits == 1 for r in per_source)
    # and the split landscape is not degenerate (>= 2 splits used)
    assert out.select("split").distinct().count() >= 2


def test_global_row_index_matches_serial_row_number(spark, sf_dir):
    """global_row_index == ROW_NUMBER() OVER (ORDER BY key) exactly,
    at every shard count (boundary placement must never change the
    index — offsets are exact), including the degenerate n_shards=1
    serial path and an empty input."""
    from pipeline_airflow_docker_spark.operators.splits import global_row_index

    d = table(spark, sf_dir, "documents").select("doc_id")
    ids = sorted(r.doc_id for r in d.collect())
    expect = {doc: i + 1 for i, doc in enumerate(ids)}
    for n_shards in (1, 2, 7, 32, 1000):  # 1000 > distinct boundaries: dedup path
        got = {
            r.doc_id: r.idx
            for r in global_row_index(d, "doc_id", n_shards=n_shards).collect()
        }
        assert got == expect, f"n_shards={n_shards}"
    empty = d.filter(F.lit(False))
    assert global_row_index(empty, "doc_id").count() == 0


def test_global_row_index_survives_heavy_skew(spark):
    """90% of keys share ONE value: quantile boundaries repeat, the
    dedup path collapses them, ties stay in one shard, and the index
    is still a dense permutation of 1..n."""
    from pipeline_airflow_docker_spark.operators.splits import global_row_index

    rows = [(7,)] * 900 + [(i,) for i in range(1000, 1100)]
    df = spark.createDataFrame(rows, "k BIGINT")
    out = global_row_index(df, "k", n_shards=16).collect()
    assert sorted(r.idx for r in out) == list(range(1, 1001))
    # all ties of k=7 occupy exactly positions 1..900
    assert {r.idx for r in out if r.k == 7} == set(range(1, 901))


def test_global_row_index_plan_has_no_global_window(spark, sf_dir):
    """The scale property itself: the executed plan's window operators
    all carry a partition spec — no single-task global sort."""
    from pipeline_airflow_docker_spark.operators.splits import global_row_index

    d = table(spark, sf_dir, "documents").select("doc_id")
    plan = (
        global_row_index(d, "doc_id", n_shards=8)
        ._jdf.queryExecution().executedPlan().toString()
    )
    for line in plan.splitlines():
        if "Window" in line and "windowspecdefinition" in line:
            assert "__shard" in line, f"global window leaked: {line}"


def test_global_row_index_string_keys(spark, sf_dir):
    """r12: STRING order keys (the hash-shaped doc ids a 100 TB corpus
    actually carries) range-shard off a seeded bounded sample instead
    of percentile_approx (which rejects strings). Values must equal
    the serial ROW_NUMBER at every shard count, under skew, and with
    the whole key space collapsing to few distinct values."""
    from pipeline_airflow_docker_spark.operators.splits import global_row_index

    d = (
        table(spark, sf_dir, "documents")
        .select(F.md5(F.col("doc_id").cast("string")).alias("k"))
    )
    ids = sorted(r.k for r in d.collect())
    expect = {k: i + 1 for i, k in enumerate(ids)}
    for n_shards in (2, 16, 1000):
        got = {
            r.k: r.idx
            for r in global_row_index(d, "k", n_shards=n_shards).collect()
        }
        assert got == expect, f"n_shards={n_shards}"
    # heavy skew: 90% of rows share one string key; ties stay dense
    rows = [("dup",)] * 900 + [(f"u{i:04d}",) for i in range(100)]
    df = spark.createDataFrame(rows, "k STRING")
    out = global_row_index(df, "k", n_shards=8).collect()
    assert sorted(r.idx for r in out) == list(range(1, 1001))
    assert {r.idx for r in out if r.k == "dup"} == set(range(1, 901))
    # empty input degenerates cleanly through the sampled path too
    assert global_row_index(df.filter(F.lit(False)), "k").count() == 0


def test_global_row_index_is_bigint_end_to_end(spark, sf_dir):
    """Red fence (r11 verdict #1): idx must be LongType on BOTH paths.
    The operator exists for corpora past the single-task-sort ceiling;
    an int32 index silently wraps past 2,147,483,647 rows under the
    session's ansi.enabled=false."""
    from pyspark.sql.types import LongType

    from pipeline_airflow_docker_spark.operators.splits import global_row_index

    d = table(spark, sf_dir, "documents").select("doc_id")
    sharded = global_row_index(d, "doc_id", n_shards=8)
    assert isinstance(sharded.schema["idx"].dataType, LongType)
    serial = global_row_index(d, "doc_id", n_shards=1)  # degenerate path
    assert isinstance(serial.schema["idx"].dataType, LongType)


def test_global_row_index_offset_arithmetic_past_int32(spark):
    """The exact expression shape the operator builds — LONG literal
    offsets in a create_map, element_at, + row_number cast bigint —
    stays correct when the cumulative offset exceeds 2^31. Also pins
    that the fence discriminates: the pre-r12 int32 shape wraps the
    same sum negative under ansi.enabled=false."""
    from pyspark.sql import Window

    big = 2_147_483_647 + 5  # acc > int32 max, as at ~2.1B+ corpus rows
    df = spark.createDataFrame([(i,) for i in range(3)], "k BIGINT")
    df = df.withColumn("__shard", F.lit(0))
    w = Window.partitionBy("__shard").orderBy("k")
    off = F.element_at(
        F.create_map(F.lit(0), F.lit(big).cast("bigint")), F.col("__shard")
    )
    good = df.withColumn("idx", F.row_number().over(w).cast("bigint") + off)
    vals = sorted(r.idx for r in good.collect())
    assert vals == [big + 1, big + 2, big + 3]
    wrapped = df.withColumn(
        "idx", (F.row_number().over(w) + F.lit(big)).cast("int")
    )
    assert all(r.idx < 0 for r in wrapped.collect()), (
        "int32 cast no longer wraps — if Spark semantics changed, "
        "re-evaluate whether this fence is still needed"
    )
