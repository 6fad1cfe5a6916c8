"""Degenerate-data parity gate (CI slice).

tools/gen_degenerate_data.py builds an adversarial variant of the test
tables — NULL/empty/whitespace/unicode text, malformed JSON, NULL
measures and group keys, NULL/empty/zero vectors — and the ordinary
Spark-vs-DuckDB comparison runs against it unchanged. The first sweep
(round 5) failed 38/150 keys; every root cause is fixed and this test
keeps one representative key per failure family red-fenced. The FULL
150-key degenerate sweep is a round ritual:

    python tools/gen_degenerate_data.py
    python tools/check_parity.py --sf /root/repo/.benchdata/degen
"""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools import check_parity, gen_degenerate_data  # noqa: E402

from pipeline_airflow_docker_spark.catalog import TABLES  # noqa: E402

# One representative per round-5 failure family:
KEYS = [
    "q_token_count",     # size(NULL) = -1 legacy conf
    "q_chunk_docs",      # NULL text -> zero chunks
    "q_lang_id",         # NULL scores -> 'und', not CASE fall-through
    "q_fn_json",         # malformed JSON -> NULL, not an oracle error
    "q_fn_map",          # bad props lose only their own entries
    "q_json_roundtrip",  # from_json degenerate ladder
    "q_variant",         # try_parse_json / try_variant_get
    "q_dedup_minhash",   # NULL text never LSH-matches anything
    "q_dedup_simhash",   # NULL text -> NULL simhash, row kept
    "q_multimodal_features",  # NULL payload skips, not crashes
    "q_media_resize",    # NULL payload keeps a 1:1 NULL row
    "q_agg_mad",         # rank stats over non-NULL measures
    "q_quantile_bucket",  # ntile over non-NULL values
    "q_agg_group",       # exact-decimal products + string round-trip
    "q_gapfill",         # NULL-safe grid join (NULL user_id series)
    "q_impute",          # was_imputed reflects the actual source NULL
    "q_kmeans",          # valid-vector domain; degenerates -> -1
    "q_nest_struct",     # null struct fields serialize, not vanish
]


def _build_fixture(tmp_path_factory, mode: str) -> tuple[str, "duckdb.DuckDBPyConnection"]:
    out = str(tmp_path_factory.mktemp(mode))
    sys.argv, argv = ["gen", "--out", out, "--mode", mode], sys.argv
    try:
        gen_degenerate_data.main()
    finally:
        sys.argv = argv
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * "
            f"FROM read_parquet('{out}/{t}.parquet')"
        )
    return out, con


@pytest.fixture(scope="module")
def degen_fixture(tmp_path_factory):
    return _build_fixture(tmp_path_factory, "degen")


@pytest.mark.parametrize("key", KEYS)
def test_degenerate_parity(key, spark, degen_fixture):
    r = check_parity.check(key, degen_fixture[0], spark, degen_fixture[1])
    assert r["status"] in ("OK", "ROWS_ONLY"), r


# Empty-corpus fixture (pipeline-first-run state). One representative
# per zero-row failure family found by the round-5 sweep:
EMPTY_KEYS = [
    "q_agg_rollup",        # Spark emits no grand-total row on empty
    "q_grouping_sets",     # same contract through the shared SQL text
    "q_stream_late_drop",  # choreography anchored on min/max ts
    "q_stream_join_outer", # same: empty branch (watermark flush sentinels)
    "q_agg_group",         # plain grouped agg: 0 rows both engines
    "q_dedup_minhash",     # LSH over an empty corpus
]


@pytest.fixture(scope="module")
def empty_fixture(tmp_path_factory):
    return _build_fixture(tmp_path_factory, "empty")


@pytest.mark.parametrize("key", EMPTY_KEYS)
def test_empty_corpus_parity(key, spark, empty_fixture):
    r = check_parity.check(key, empty_fixture[0], spark, empty_fixture[1])
    assert r["status"] in ("OK", "ROWS_ONLY"), r
