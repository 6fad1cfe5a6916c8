"""Physical-layout invariance gate (CI slice) — the round-16 fuzz axis.

tools/gen_layout_data.py rewrites the sf0.001 fixture as directories
of seeded-hash-scrambled part files (empty partitions included): same
logical rows, hostile physical layout. A query whose VALUES (under the
order-insensitive parity hash) move with the layout is silently wrong
at 100 TB, where tables are thousands of part files in no particular
order — the classes at risk are scan-order tie-breaks (row_number,
keep-best dedup, "deterministic shuffle" ordering), partition-index-
ordered aggregation (string_agg), and streams whose micro-batch
boundaries follow file boundaries.

This slice pins one representative per at-risk class against the
DuckDB oracle (which is layout-independent by construction). The full
150-key sweep runs per round:

    python tools/gen_layout_data.py --seed <round>
    python tools/check_parity.py --sf /root/repo/.benchdata/layout<round>

(first swept round 16: 150/150 OK/ROWS_ONLY on seed 16).
"""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
for p in (_REPO, os.path.join(_REPO, "tools")):
    if p not in sys.path:
        sys.path.insert(0, p)

import check_parity  # noqa: E402
import gen_layout_data  # noqa: E402

from pipeline_airflow_docker_spark.catalog import TABLES  # noqa: E402

# One representative per layout-sensitivity class:
KEYS = [
    "q_row_number",      # enumerate: rank must be a content order, not
    #                      scan order (range-sharded window impl)
    "q_shuffle_order",   # C23 "deterministic shuffle": content-
    #                      addressed order must survive re-layout
    "q_agg_stringagg",   # ordered string_agg: explicit ORDER BY inside
    #                      the aggregate, never partition-index order
    "q_dedup_keep_best", # keep-best must pick by declared criteria,
    #                      not "first seen" in scan order
    "q_topk",            # bounded TakeOrderedAndProject with ties
    "q_stream_bounded",  # AvailableNow micro-batches now follow 7 data
    #                      part files plus 1 planted empty = 8 parquet
    #                      files per table instead of one
    "q_union_ragged",    # ragged union over per-file schemas/batches
]


@pytest.fixture(scope="module")
def layout_fixture(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("layout"))
    sys.argv, argv = ["gen", "--seed", "99", "--out", out], sys.argv
    try:
        gen_layout_data.main()
    finally:
        sys.argv = argv
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * "
            f"FROM read_parquet('{out}/{t}.parquet/*.parquet')"
        )
    yield out, con
    con.close()


@pytest.mark.parametrize("key", KEYS)
def test_layout_parity(key, spark, layout_fixture):
    sf_dir, con = layout_fixture
    r = check_parity.check(key, sf_dir, spark, con)
    assert r["status"] in ("OK", "ROWS_ONLY"), r


def test_layout_fixture_is_deterministic(tmp_path, spark):
    """Same seed -> byte-identical part files (the fixture must be
    reproducible for red-fencing, like every other fixture axis)."""
    import hashlib  # noqa: PLC0415

    outs = []
    for sub in ("a", "b"):
        out = str(tmp_path / sub)
        sys.argv, argv = [
            "gen", "--seed", "7", "--out", out, "--files", "3",
        ], sys.argv
        try:
            gen_layout_data.main()
        finally:
            sys.argv = argv
        digest = hashlib.sha256()
        t_dir = os.path.join(out, "lineitem.parquet")
        for f in sorted(os.listdir(t_dir)):
            if f.endswith(".parquet"):
                with open(os.path.join(t_dir, f), "rb") as fh:
                    digest.update(fh.read())
        outs.append(digest.hexdigest())
    assert outs[0] == outs[1]
