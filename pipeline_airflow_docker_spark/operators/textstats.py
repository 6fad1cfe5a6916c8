"""Text-analysis operators for LLM training-data pipelines
(SURVEY.md §2 Part C): token statistics, quality scoring, language ID,
token counting, document fingerprinting.

All JVM built-ins / higher-order functions — no Python in the hot
path; every expression is written to be bit-reproducible against the
DuckDB oracle (integer counts; double math only as single divisions /
fixed-shape combinations of identical operands).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from pipeline_airflow_docker_spark.functions.text import (
    count_in,
    seeded_md5,
    shingles,
    tokens,
)

STOPWORDS: tuple[str, ...] = ("the", "a", "an", "of", "and", "to", "in", "is", "it")

# Marker words per language for the n-gram/stopword-overlap heuristic.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein"),
    "en": ("the", "a", "of", "and", "is", "to", "it"),
    "es": ("el", "los", "las", "y", "es", "un", "una"),
    "fr": ("le", "les", "des", "et", "est", "une", "du"),
}

# BPE-ish pre-tokenizer: letter runs | digit runs | single punctuation.
BPE_PATTERN = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"


def text_stats(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-document statistics: token count, distinct-token count,
    type/token ratio, mean token length, stopword ratio."""
    toks = tokens(text_col)
    n_tok = F.size(toks)
    sum_len = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    return df.select(
        F.col(id_col),
        F.length(text_col).alias("n_chars_m"),
        n_tok.alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_types"),
        (F.size(F.array_distinct(toks)).cast("double") / n_tok).alias("ttr"),
        (sum_len.cast("double") / n_tok).alias("avg_token_len"),
        (count_in(toks, STOPWORDS).cast("double") / n_tok).alias("stopword_ratio"),
    )


def quality_expr(text_col: str = "text") -> Column:
    """The composite quality score as a reusable column expression —
    length saturation, lexical diversity, non-stopword density; fixed
    left-associative combination so the float result reproduces
    anywhere. Exposed separately so pipelines can compute quality
    inline (one projection) instead of joining quality_score's output
    back to the text — which would duplicate the upstream subtree."""
    toks = tokens(text_col)
    n_tok = F.size(toks)
    ttr = F.size(F.array_distinct(toks)).cast("double") / n_tok
    stop = count_in(toks, STOPWORDS).cast("double") / n_tok
    len_sat = F.least(n_tok.cast("double") / F.lit(100.0), F.lit(1.0))
    score = F.lit(0.4) * len_sat + F.lit(0.3) * ttr + F.lit(0.3) * (F.lit(1.0) - stop)
    return F.round(score, 6)


def quality_score(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Composite quality score in [0,1] per document (see
    quality_expr)."""
    return df.select(F.col(id_col), quality_expr(text_col).alias("quality"))


def lang_id(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Marker-word language ID. Scores each language by marker-token
    hits; argmax with ties broken by language code order; 'und' when
    nothing matches."""
    toks = tokens(text_col)
    scores = {lang: count_in(toks, words) for lang, words in sorted(LANG_MARKERS.items())}
    langs = list(scores)
    best: Column = F.lit("und")
    best_score: Column = F.lit(0)
    # Left-to-right: earlier (alphabetically smaller) lang wins ties.
    for lang in langs:
        take = scores[lang] > best_score
        best = F.when(take, F.lit(lang)).otherwise(best)
        best_score = F.when(take, scores[lang]).otherwise(best_score)
    return df.select(
        F.col(id_col),
        *[scores[lang].alias(f"score_{lang}") for lang in langs],
        best.alias("pred_lang"),
    )


def token_counts(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Whitespace and BPE-ish-regex token counts + a bytes-per-token
    cost estimate (the unit LLM data budgets are planned in)."""
    n_ws = F.size(tokens(text_col))
    n_bpe = F.size(F.regexp_extract_all(text_col, F.lit(BPE_PATTERN), 0))
    return df.select(
        F.col(id_col),
        n_ws.alias("n_tokens_ws"),
        n_bpe.alias("n_tokens_bpe"),
        (F.octet_length(text_col).cast("double") / n_bpe).alias("bytes_per_token"),
    )


def fingerprint(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", window: int = 8
) -> DataFrame:
    """Document fingerprints: full-content md5 plus a winnowing-style
    rolling fingerprint (minimum hash over ``window``-token shingles) —
    stable under small edits away from the minimizing window."""
    # Stage toks, then the shingle array, as real columns: an inline
    # split/shingle expression is re-evaluated per element access
    # inside the downstream higher-order lambdas (measured 4× on the
    # gram operators at sf10).
    return (
        df.select(
            F.col(id_col),
            F.col(text_col).alias("__text"),
            tokens(text_col).alias("__toks"),
        )
        .select(
            id_col, "__text", shingles(F.col("__toks"), window).alias("__sh")
        )
        .select(
            F.col(id_col),
            F.md5(F.col("__text")).alias("content_fp"),
            F.array_min(
                F.transform(F.col("__sh"), lambda s: seeded_md5(s, 0))
            ).alias("rolling_fp"),
        )
    )


def repetition_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 2,
    top_frac_max: float = 0.20,
    dup_frac_max: float = 0.50,
) -> DataFrame:
    """Gopher-style repetition signals per document: the fraction of
    token ``n``-grams taken by the single most frequent n-gram
    (``top_gram_frac``) and the fraction belonging to any n-gram that
    occurs more than once (``dup_gram_frac``), plus the resulting
    ``keep`` verdict. Boilerplate, keyword-stuffed, and looping
    machine-generated text scores high on both; the thresholds are the
    knobs a corpus-cleaning pipeline tunes per source.

    Scale shape: explode n-grams -> count per (doc, gram) -> one more
    grouped aggregate per doc. Both aggregates are partial-agg
    (map-side combine) friendly and key on doc id, so the shuffle is
    linear in corpus size and skew-free (a document's grams all hash
    to its own key). Integer counts; two double divisions at the end —
    bit-reproducible cross-engine.
    """
    # Token array staged as a column first — the shingle lambda reads
    # it per element, and an inline split would be re-evaluated each
    # time (measured 4× on this shape at sf10).
    grams = df.select(
        F.col(id_col).alias("id"), tokens(text_col).alias("__toks")
    ).select("id", F.explode(shingles(F.col("__toks"), n)).alias("g"))
    per_gram = grams.groupBy("id", "g").agg(F.count(F.lit(1)).alias("cnt"))
    agg = per_gram.groupBy("id").agg(
        F.sum("cnt").alias("n_grams"),
        F.max("cnt").alias("top_cnt"),
        F.sum(F.when(F.col("cnt") > 1, F.col("cnt")).otherwise(F.lit(0))).alias(
            "dup_cnt"
        ),
    )
    top_frac = F.col("top_cnt").cast("double") / F.col("n_grams")
    dup_frac = F.col("dup_cnt").cast("double") / F.col("n_grams")
    return agg.select(
        F.col("id").alias(id_col),
        "n_grams",
        top_frac.alias("top_gram_frac"),
        dup_frac.alias("dup_gram_frac"),
        ((top_frac <= top_frac_max) & (dup_frac <= dup_frac_max)).alias("keep"),
    )


def tfidf_top_terms(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", k: int = 5
) -> DataFrame:
    """Top-``k`` TF-IDF terms per document (smoothed idf:
    ``ln((N+1)/(df+1)) + 1``, sklearn's convention).

    Scale shape: explode -> (doc, term) count -> document frequency as
    a COUNT window over the tf rows partitioned by term (one row per
    (doc, term), so the window count IS the doc frequency — saves the
    tf-to-dfreq self-join and its extra exchanges) -> per-doc top-k
    window. Three keyed shuffles total; the corpus-size scalar is a
    1-row broadcast cross join (plans as a single-row BNLJ — the
    benign kind), never a driver round-trip in the plan. Scores are
    rounded to 6 decimals *before* ranking so ordering (and the
    cross-engine oracle hash) is immune to the <=1-ulp libm log
    differences between engines; ties break on the term string.
    """
    toks = df.select(F.col(id_col).alias("id"), tokens(text_col).alias("toks"))
    tf = (
        toks.select("id", F.explode("toks").alias("term"))
        .groupBy("id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    n_docs = df.select(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.withColumn(
            "dfreq", F.count(F.lit(1)).over(Window.partitionBy("term"))
        )
        .crossJoin(F.broadcast(n_docs))
        .select(
            "id",
            "term",
            F.round(
                F.col("tf")
                * (
                    F.log(
                        (F.col("n_docs") + F.lit(1.0))
                        / (F.col("dfreq") + F.lit(1.0))
                    )
                    + F.lit(1.0)
                ),
                6,
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("id").orderBy(F.col("tfidf").desc(), F.col("term"))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .select(F.col("id").alias(id_col), "term", "tfidf")
    )


def vocabulary(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_k: int = 100,
) -> DataFrame:
    """Corpus vocabulary: the ``top_k`` tokens by total term frequency,
    with document frequency attached — the first pass of any
    tokenizer/BPE training or stopword-selection job.

    One explode + one keyed aggregate (partial map-side combine on the
    token, two-phase distinct for document frequency), then top-k via
    ``orderBy().limit()`` which Spark plans as TakeOrderedAndProject —
    per-partition heaps, only ``top_k`` rows reach the driver-side
    merge. Ties break on the token itself so the cut is total-ordered
    and reproducible at any parallelism.
    """
    tok = df.select(
        F.col(id_col).alias("__doc"), F.explode(tokens(text_col)).alias("token")
    )
    agg = tok.groupBy("token").agg(
        F.count(F.lit(1)).alias("tf"),
        F.countDistinct("__doc").alias("df_docs"),
    )
    return agg.orderBy(F.desc("tf"), F.asc("token")).limit(top_k)


def ngram_counts(
    df: DataFrame, text_col: str = "text", n: int = 2, top_k: int = 100
) -> DataFrame:
    """Corpus-wide word-``n``-gram frequencies, top ``top_k``: the
    n-gram language-model / contamination-screen companion to
    ``vocabulary``. Documents shorter than ``n`` tokens are skipped
    (no padded partial grams). Same single-shuffle + TakeOrdered shape
    as ``vocabulary``."""
    return (
        df.select(tokens(text_col).alias("__toks"))
        .filter(F.size("__toks") >= n)
        .select(F.explode(shingles(F.col("__toks"), n)).alias("gram"))
        .groupBy("gram")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("gram"))
        .limit(top_k)
    )


def oov_rate(
    df: DataFrame,
    vocab: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    token_col: str = "token",
) -> DataFrame:
    """Per-document out-of-vocabulary rate against a vocabulary frame —
    the tokenizer-coverage check run before committing a corpus to a
    fixed vocab (high OOV => wrong tokenizer or wrong corpus slice).

    Plan shape: explode tokens map-side, LEFT JOIN against the
    broadcast vocabulary (a top-k vocab is KBs by construction), then
    one keyed aggregate back to documents. The corpus shuffles once,
    keyed by its own doc id — skew-free by construction.
    """
    tok = df.select(
        F.col(id_col).alias("__doc"), F.explode(tokens(text_col)).alias("token")
    )
    v = F.broadcast(vocab.select(F.col(token_col), F.lit(True).alias("__in_vocab")))
    flagged = tok.join(v, "token", "left")
    return (
        flagged.groupBy("__doc")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(
                F.when(F.col("__in_vocab").isNull(), 1).otherwise(0)
            ).alias("n_oov"),
        )
        .select(
            F.col("__doc").alias(id_col),
            "n_tokens",
            "n_oov",
            (F.col("n_oov") / F.col("n_tokens")).alias("oov_ratio"),
        )
    )


def rare_bigram_ratio(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    rare_max: int = 2,
) -> DataFrame:
    """Statistical gibberish signal: the fraction of a document's word
    bigrams that are rare corpus-wide (count <= ``rare_max``) — an
    integer-exact stand-in for the LM-perplexity quality filter
    (CCNet-style): fluent text reuses the corpus's common transitions,
    shredded/gibberish text doesn't. Deliberately integer-only (counts
    and one final ratio division) so the score is bit-reproducible
    cross-engine, which float log-prob sums are not.

    Plan: bigrams exploded map-side and materialized once (read by the
    count and the join); corpus bigram counts are one keyed aggregate;
    the count join is keyed on the bigram (skew-free: a document's
    grams spread over the hash space); per-doc aggregate keyed by id.
    Documents shorter than 2 tokens carry no bigrams and drop out.
    """
    from pipeline_airflow_docker_spark.functions.materialize import (  # noqa: PLC0415
        materialize,
    )

    grams = materialize(
        df.select(
            F.col(id_col).alias("__doc"), tokens(text_col).alias("__toks")
        )
        .filter(F.size("__toks") >= 2)
        .select("__doc", F.explode(shingles(F.col("__toks"), 2)).alias("gram"))
    )
    counts = grams.groupBy("gram").agg(F.count(F.lit(1)).alias("cnt"))
    return (
        grams.join(counts, "gram")
        .groupBy("__doc")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum(
                F.when(F.col("cnt") <= rare_max, 1).otherwise(0)
            ).alias("n_rare"),
        )
        .select(
            F.col("__doc").alias(id_col),
            "n_bigrams",
            "n_rare",
            (F.col("n_rare") / F.col("n_bigrams")).alias("rare_ratio"),
        )
    )


def gopher_rules(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = 50,
    max_tokens: int = 100_000,
    min_avg_len: float = 3.0,
    max_avg_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    min_alpha_word_ratio: float = 0.8,
) -> DataFrame:
    """Gopher-style document quality rules (Rae et al. 2021 §A1.1, the
    standard pre-training heuristic gate): token-count bounds, mean
    token length bounds, symbol-to-token ratio (# and ellipsis), and
    the fraction of tokens containing at least one alphabetic
    character. Emits every signal plus the composite keep verdict so
    pipelines can audit which rule fired.

    Pure map-side column expressions (one projection, zero shuffle);
    integer counts and single-division ratios — bit-reproducible
    cross-engine.
    """
    toks = tokens(text_col)
    n_tok = F.size(toks)
    sum_len = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    avg_len = sum_len.cast("double") / n_tok
    n_symbol = (
        F.size(F.filter(toks, lambda t: t.contains("#") | t.contains("...")))
    )
    n_alpha = F.size(F.filter(toks, lambda t: t.rlike("[a-zA-Z]")))
    symbol_ratio = n_symbol.cast("double") / n_tok
    alpha_ratio = n_alpha.cast("double") / n_tok
    keep = (
        (n_tok >= min_tokens)
        & (n_tok <= max_tokens)
        & (avg_len >= min_avg_len)
        & (avg_len <= max_avg_len)
        & (symbol_ratio <= max_symbol_ratio)
        & (alpha_ratio >= min_alpha_word_ratio)
    )
    return df.select(
        F.col(id_col),
        n_tok.alias("n_tokens"),
        avg_len.alias("avg_token_len"),
        symbol_ratio.alias("symbol_ratio"),
        alpha_ratio.alias("alpha_word_ratio"),
        keep.alias("keep"),
    )


def word_entropy(
    df: DataFrame,
    group_col: str,
    text_col: str = "text",
) -> DataFrame:
    """Shannon entropy of the word distribution per group (C29) — the
    information-theoretic corpus-quality signal: near-zero entropy
    flags templated/boilerplate sources, and entropy tracked per
    ingest slice catches silent distribution collapse (a scraper stuck
    on one page family). Complements C26's type-token ratio (which
    ignores the SHAPE of the frequency distribution) and C22's corpus
    counts.

    Deterministic cross-engine: H = ln(S) - sum(c*ln(c))/S over word
    counts c with total S. The per-word terms c*ln(c) are rounded to
    6 dp and summed in exact DECIMAL (order-independent — raw double
    sums are partition-order-dependent and never bit-reproduce), then
    one decimal->double cast, one division, one subtraction — all
    correctly-rounded IEEE ops on identical operands.

    Scale shape: explode -> two chained aggregates, both with map-side
    partials; the (group, word) shuffle carries counts, not text.
    Returns (group, n_tokens, n_types, entropy_nats).
    """
    toks = tokens(text_col)
    words = df.select(
        F.col(group_col), F.explode(toks).alias("__w")
    ).filter(F.col("__w") != "")
    counts = words.groupBy(group_col, "__w").agg(
        F.count(F.lit(1)).alias("__c")
    )
    term = F.round(F.col("__c") * F.log(F.col("__c")), 6).cast(
        "decimal(28,6)"
    )
    agg = counts.groupBy(group_col).agg(
        F.sum("__c").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_types"),
        F.sum(term).cast("double").alias("__sclc"),
    )
    s = F.col("n_tokens").cast("double")
    return agg.select(
        group_col,
        "n_tokens",
        "n_types",
        F.round(F.log(s) - F.col("__sclc") / s, 6).alias("entropy_nats"),
    )


def pmi_bigrams(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 5,
    top_k: int = 20,
) -> DataFrame:
    """Top collocations by pointwise mutual information (C30):
    PMI(w1,w2) = ln p(w1,w2) - ln p(w1) - ln p(w2) over adjacent word
    pairs — the classic corpus-analysis surface for multi-word
    expressions, and a dedup/contamination lens (an unnaturally strong
    collocation often IS boilerplate). min_count guards the low-count
    PMI explosion.

    Bigrams are built map-side with a sequence/transform expression
    (no window, no self-join). The PMI is computed in log space as
    ln(b) + 2*ln(tu) - ln(tb) - ln(u1) - ln(u2) — five correctly-
    rounded ln's of exact integers combined in a FIXED left-to-right
    association (written identically in the oracle), so no count
    product can overflow int64 at corpus scale and the double result
    is bit-identical cross-engine; rounded to 6 dp, ties break on the
    words. Unigram totals attach by two broadcast joins (the unigram
    count table is vocabulary-sized, not corpus-sized); corpus totals
    ride a 1-row broadcast cross join.

    Returns top_k rows: (w1, w2, pair_count, pmi).
    """
    toks = tokens(text_col)
    # sequence(0, n) DESCENDS when n < 0 (one-token doc => [0, -1]), so
    # index over the full array — the final pair's w2 is the one-past-
    # the-end null — and drop null-w2 pairs (split() never yields null
    # tokens, so the only null w2 IS the sentinel).
    # Token array staged as a column first: the transform lambda reads
    # it per element, and the inline split(...) form re-evaluated the
    # split on every access (measured 52 s -> ~13 s at sf10).
    pairs = (
        df.select(tokens(text_col).alias("__t"))
        .select(
            F.explode(
                F.expr(
                    "filter(transform(sequence(0, size(__t) - 1),"
                    " i -> struct(__t[i] as w1, __t[i+1] as w2)),"
                    " p -> p.w2 is not null)"
                )
            ).alias("__p")
        )
        .select("__p.w1", "__p.w2")
    )
    bi = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("pair_count"))
    uni = (
        df.select(F.explode(toks).alias("__w"))
        .filter(F.col("__w") != "")
        .groupBy("__w")
        .agg(F.count(F.lit(1)).alias("__u"))
    )
    tot = bi.agg(F.sum("pair_count").alias("__tb")).crossJoin(
        uni.agg(F.sum("__u").alias("__tu"))
    )
    u1 = uni.select(F.col("__w").alias("w1"), F.col("__u").alias("__u1"))
    u2 = uni.select(F.col("__w").alias("w2"), F.col("__u").alias("__u2"))
    pmi = F.round(
        F.log("pair_count")
        + 2 * F.log("__tu")
        - F.log("__tb")
        - F.log("__u1")
        - F.log("__u2"),
        6,
    )
    return (
        bi.filter(F.col("pair_count") >= min_count)
        .join(F.broadcast(u1), "w1")
        .join(F.broadcast(u2), "w2")
        .crossJoin(F.broadcast(tot))
        .select("w1", "w2", "pair_count", pmi.alias("pmi"))
        .orderBy(F.col("pmi").desc(), "w1", "w2")
        .limit(top_k)
    )


def zipf_slope(
    df: DataFrame,
    group_col: str,
    text_col: str = "text",
) -> DataFrame:
    """Zipf's-law fit per group (C31): the least-squares slope of
    ln(frequency) against ln(rank) over the group's word-frequency
    table. Natural corpora slope near -1; templated or synthetic text
    deviates hard — a one-number distributional health check per
    source/language that complements C29's entropy (entropy summarizes
    the distribution, the slope its SHAPE).

    Rank is deterministic (count desc, word asc). The regression
    moments are B37's trick: per-word terms x=ln(rank), y=ln(count)
    are rounded to 8 dp, products to 8 dp, each summed in exact
    DECIMAL, so the slope is reproducible across engines and
    partitionings; slope = (n*Sxy - Sx*Sy) / (n*Sxx - Sx*Sx) as fixed
    double arithmetic, rounded to 6 dp.

    Scale shape: the word-count aggregate shuffles counts map-side;
    the rank window partitions by GROUP over the vocabulary-sized
    counts table (vocabularies are ~10^6 rows even at 100 TB — this
    window never sees the corpus; for pathological vocabularies swap
    in operators/ranks.binned_scaled_rank on ln(count) bins). Returns
    (group, n_types, zipf_slope).
    """
    toks = tokens(text_col)
    counts = (
        df.select(F.col(group_col), F.explode(toks).alias("__w"))
        .filter(F.col("__w") != "")
        .groupBy(group_col, "__w")
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    w = Window.partitionBy(group_col).orderBy(
        F.col("__c").desc(), F.col("__w").asc()
    )
    xy = counts.select(
        F.col(group_col),
        F.round(F.log(F.row_number().over(w)), 8).alias("__x"),
        F.round(F.log(F.col("__c")), 8).alias("__y"),
    )
    d = lambda c: F.round(c, 8).cast("decimal(28,8)")  # noqa: E731
    m = xy.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_types"),
        F.sum(d(F.col("__x"))).cast("double").alias("__sx"),
        F.sum(d(F.col("__y"))).cast("double").alias("__sy"),
        F.sum(d(F.col("__x") * F.col("__x"))).cast("double").alias("__sxx"),
        F.sum(d(F.col("__x") * F.col("__y"))).cast("double").alias("__sxy"),
    )
    n = F.col("n_types").cast("double")
    slope = (n * F.col("__sxy") - F.col("__sx") * F.col("__sy")) / (
        n * F.col("__sxx") - F.col("__sx") * F.col("__sx")
    )
    return m.select(group_col, "n_types", F.round(slope, 6).alias("zipf_slope"))
