"""Composable DataFrame -> DataFrame operators.

Each module re-expresses a family of reference capabilities
(SURVEY.md §2 Part A) or an ``[EXT]`` extension family (Parts B/C) as
pure declarative transformations, so Catalyst can fuse whole pipelines
into single physical plans (the reference materialized every stage to
/tmp between tasks — SURVEY.md §4.1).
"""

from pipeline_airflow_docker_spark.operators.cleaning import (  # noqa: F401
    drop_null_rows,
    impute_group_mean,
    require_keys,
)
from pipeline_airflow_docker_spark.operators.enrich import (  # noqa: F401
    enrich,
    json_deserialize,
    json_serialize,
    nest_struct,
)
from pipeline_airflow_docker_spark.operators.combine import union_ragged  # noqa: F401
from pipeline_airflow_docker_spark.operators.upsert import latest_by_key  # noqa: F401
from pipeline_airflow_docker_spark.operators.chunking import chunk_tokens  # noqa: F401
from pipeline_airflow_docker_spark.operators.corpus import clean_corpus  # noqa: F401
from pipeline_airflow_docker_spark.operators.decontam import (  # noqa: F401
    contaminated_ids,
    decontaminate,
)
from pipeline_airflow_docker_spark.operators.dedup import (  # noqa: F401
    dedup_exact,
    embedding_dup_pairs,
    minhash_dup_pairs,
    minhash_incremental,
    ngram_jaccard_pairs,
    resolve_components,
    segment_boilerplate_removal,
    simhash_docs,
    simhash_dup_pairs,
)
from pipeline_airflow_docker_spark.operators.intervals import (  # noqa: F401
    bin_interval_join,
    scd2_intervals,
    sessionize,
)
from pipeline_airflow_docker_spark.operators.reconcile import (  # noqa: F401
    table_diff,
)
from pipeline_airflow_docker_spark.operators.embeddings import (  # noqa: F401
    l2_normalize,
    quantize_int8,
)
from pipeline_airflow_docker_spark.operators.packing import (  # noqa: F401
    pack_sequences,
)
from pipeline_airflow_docker_spark.operators.multimodal import (  # noqa: F401
    attach_binary_payload,
    extract_features,
    resize_media,
    sample_frames,
)
from pipeline_airflow_docker_spark.operators.profile import (  # noqa: F401
    histogram_fixed,
    profile_columns,
    zscore_outliers,
)
from pipeline_airflow_docker_spark.operators.redact import redact_pii  # noqa: F401
from pipeline_airflow_docker_spark.operators.similarity import (  # noqa: F401
    kmeans_centroids,
    kmeans_lloyd,
    knn_cosine,
    knn_cosine_bucketed,
    knn_cosine_ivf,
)
from pipeline_airflow_docker_spark.operators.skew import (  # noqa: F401
    salted_agg,
    salted_join,
)
from pipeline_airflow_docker_spark.operators.splits import (  # noqa: F401
    hash_split,
    mix_corpora,
    shard_assign,
    shuffled_order,
    stratified_downsample,
    write_training_shards,
)
from pipeline_airflow_docker_spark.operators.textstats import (  # noqa: F401
    fingerprint,
    gopher_rules,
    lang_id,
    oov_rate,
    quality_score,
    rare_bigram_ratio,
    repetition_stats,
    text_stats,
    tfidf_top_terms,
    token_counts,
)
