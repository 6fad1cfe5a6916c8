"""Seeded-fuzz parity gate (CI slice).

tools/gen_fuzz_data.py rolls a fresh random value surface per seed —
skewed and NULL group keys, boundary measures, markup-like tokens,
microsecond-jittered timestamps, duplicate/empty/NULL texts — and the
ordinary Spark-vs-DuckDB comparison runs against it unchanged. The
first sweep (round 7, seed 1) failed 16/150 keys; the root causes
(NULL-group drops in the ranks broadcast joins, unescaped HTML
embedding in q_scrape, EPOCH cast rounding, a two-column dropna
oracle, the NULL-shingle clamp in the decontaminate oracle, and
sub-scale-4 fuzz measures violating functions/numeric.py's ingest
contract) are fixed, and this test keeps one representative key per
failure family red-fenced on the pinned seed. Rolling a NEW seed per
round is a round ritual:

    python tools/gen_fuzz_data.py --seed <round>
    python tools/check_parity.py --sf /root/repo/.benchdata/fuzz<round>
"""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools import check_parity, gen_fuzz_data  # noqa: E402

from pipeline_airflow_docker_spark.catalog import TABLES  # noqa: E402

# One representative per round-7 fuzz failure family:
KEYS = [
    "q_corr_spearman",   # NULL group key survives the rank LUT join
    "q_agg_mad",         # NULL group key survives the median join-back
    "q_quantile_bucket",  # NULL group key survives the ntile offsets join
    "q_scrape",          # markup-like tokens escape into the h1, round-trip
    "q_fn_date",         # fractional-second epoch floors on both engines
    "q_dropna_any",      # dropna(any) drops on EVERY column
    "q_count_gate",      # same contract through the gate CTE
    "q_decontaminate",   # NULL-text benchmark doc contributes no grams
    "q_agg_salted",      # scale-4 exact decimal sums, any partitioning
    "q_win_range",       # same, through a range-frame window
]

SEED = 1


@pytest.fixture(scope="module")
def fuzz_fixture(tmp_path_factory):
    out = str(tmp_path_factory.mktemp(f"fuzz{SEED}"))
    sys.argv, argv = ["gen", "--seed", str(SEED), "--out", out], sys.argv
    try:
        gen_fuzz_data.main()
    finally:
        sys.argv = argv
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * "
            f"FROM read_parquet('{out}/{t}.parquet')"
        )
    return out, con


@pytest.mark.parametrize("key", KEYS)
def test_fuzz_parity(key, spark, fuzz_fixture):
    r = check_parity.check(key, fuzz_fixture[0], spark, fuzz_fixture[1])
    assert r["status"] in ("OK", "ROWS_ONLY"), r
