"""Benchmark decontamination for LM training corpora
(SURVEY.md §2 Part C).

Standard eval hygiene: any training document that shares a token
n-gram with a held-out benchmark/eval document is dropped before
training, so reported benchmark numbers aren't inflated by
memorization. This is the n-gram-overlap decontamination used by most
public LM training recipes (typically 8-13-gram; parameterized here).

Scale design: the benchmark side is tiny relative to a 100 TB corpus
(thousands of eval documents), so its distinct shingle set is
broadcast — the corpus-side explode then probes a hash map in-place
and NEVER shuffles the corpus. The only wide operation is the distinct
doc_id collection of contaminated ids (small, bounded by corpus hit
count), followed by a broadcast anti-join back onto the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from pipeline_airflow_docker_spark.functions.text import shingles, tokens


def contaminated_ids(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
) -> DataFrame:
    """Distinct corpus ids sharing >= 1 token ``n``-gram with any
    benchmark document. Benchmark shingles are broadcast; the corpus
    side stays map-side until the final small distinct."""
    # toks staged as a column on both sides: the shingle lambda reads
    # it per element; inline it would re-split per access (see
    # dedup._shingle_table).
    bench_sh = (
        benchmark.select(tokens(text_col).alias("__toks"))
        .select(
            F.explode(F.array_distinct(shingles(F.col("__toks"), n))).alias("g")
        )
        .distinct()
    )
    corpus_sh = corpus.select(
        F.col(id_col).alias("id"), tokens(text_col).alias("__toks")
    ).select(
        "id",
        F.explode(F.array_distinct(shingles(F.col("__toks"), n))).alias("g"),
    )
    return (
        corpus_sh.join(broadcast(bench_sh), "g")
        .select("id")
        .distinct()
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
) -> DataFrame:
    """Corpus rows with zero ``n``-gram overlap with the benchmark set.

    The contaminated id set is small (hits only), so the anti-join
    broadcasts it — the corpus is filtered in place, no corpus shuffle.
    """
    bad = contaminated_ids(corpus, benchmark, id_col, text_col, n)
    return corpus.join(
        broadcast(bad),
        corpus[id_col] == bad["id"],
        "left_anti",
    )
