"""The parity gate's TEETH: check_parity.check must go red on drift.

Every correctness claim in this repo flows through one comparator
(tools/check_parity.py::check — the same row-count + schema +
canonical-value compare the driver applies). If that comparator ever
silently always-passed (a canonicalizer that collapses differences, a
compare against the wrong side, a status typo upstream of the ✓), all
150 green keys would be vacuous and nothing in CI would notice —
every existing test asserts the gate PASSES, none assert it can FAIL.

These tests tamper a real oracle one axis at a time against the real
sf0.001 fixture and pin the exact red status each tamper produces:
value drift, row-count drift, schema drift, a Spark-inexpressible
oracle type, and a rows-only key (no oracle). Plus canonicalizer
invariants the hash compare stands on: row/column order insensitivity
and the value classes that must NOT collapse (+0.0 vs -0.0 is
VALUE-level drift the float-order contracts depend on; NaN equals
itself so a NaN cell is comparable at all; decimal trailing zeros DO
collapse by design).
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

from pipeline_airflow_docker_spark import plans  # noqa: E402
from pipeline_airflow_docker_spark.catalog import TABLES  # noqa: E402

SF = "/root/testdata/sf0.001"
KEY = "q_agg_group"  # flagship: known-green, numeric + string columns


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * "
            f"FROM read_parquet('{SF}/{t}.parquet')"
        )
    yield c
    c.close()


def test_gate_green_on_untampered_oracle(spark, con):
    assert check_parity.check(KEY, SF, spark, con)["status"] == "OK"


def test_gate_reds_value_drift(spark, con, monkeypatch):
    """One unit added to one aggregate in one row class must flip the
    verdict to VALUE_MISMATCH with the diff surfaced."""
    tampered = (
        "SELECT * REPLACE (sum_qty + 1 AS sum_qty) "
        f"FROM ({plans.ORACLES[KEY]}) t"
    )
    monkeypatch.setitem(plans.ORACLES, KEY, tampered)
    r = check_parity.check(KEY, SF, spark, con)
    assert r["status"] == "VALUE_MISMATCH"
    assert r["n_diff_rows"] >= 1 and r["first_diff"] is not None


def test_gate_reds_rowcount_drift(spark, con, monkeypatch):
    tampered = f"SELECT * FROM ({plans.ORACLES[KEY]}) t LIMIT 1"
    monkeypatch.setitem(plans.ORACLES, KEY, tampered)
    assert check_parity.check(KEY, SF, spark, con)["status"] == (
        "ROWCOUNT_MISMATCH"
    )


def test_gate_reds_schema_drift(spark, con, monkeypatch):
    tampered = (
        f"SELECT t.*, 1 AS unexpected_col FROM ({plans.ORACLES[KEY]}) t"
    )
    monkeypatch.setitem(plans.ORACLES, KEY, tampered)
    r = check_parity.check(KEY, SF, spark, con)
    assert r["status"] == "SCHEMA_MISMATCH"
    assert "unexpected_col" in r["detail"]


def test_gate_reds_inexpressible_oracle_type(spark, con, monkeypatch):
    """A HUGEINT-emitting oracle must be refused BEFORE value fetch
    (fetched, it collapses into a plain Python int and the type error
    becomes invisible — the round-4 failure mode)."""
    monkeypatch.setitem(
        plans.QUERIES, "q_teeth", lambda s, sf: s.range(1).selectExpr(
            "CAST(id AS BIGINT) AS x"
        )
    )
    monkeypatch.setitem(
        plans.ORACLES, "q_teeth", "SELECT CAST(0 AS HUGEINT) AS x"
    )
    r = check_parity.check("q_teeth", SF, spark, con)
    assert r["status"] == "ORACLE_TYPE"
    assert "HUGEINT" in r["detail"].upper()


def test_gate_rows_only_when_no_oracle(spark, con, monkeypatch):
    monkeypatch.setitem(
        plans.QUERIES, "q_teeth", lambda s, sf: s.range(3)
    )
    plans.ORACLES.pop("q_teeth", None)
    r = check_parity.check("q_teeth", SF, spark, con)
    assert r["status"] == "ROWS_ONLY" and r["spark_rows"] == 3


# -- canonicalizer invariants ------------------------------------------------


def test_canon_is_row_and_column_order_insensitive():
    a = check_parity._rows_canon(["b", "a"], [(2.0, 1), (4.0, 3)])
    b = check_parity._rows_canon(["a", "b"], [(3, 4.0), (1, 2.0)])
    assert a == b


def test_canon_distinguishes_signed_zero_and_handles_nan():
    """-0.0 vs +0.0 is real drift (the float-order contract family);
    NaN must compare equal to itself (a NaN cell must not make a row
    incomparable)."""
    assert check_parity._canon(0.0) != check_parity._canon(-0.0)
    assert check_parity._canon(float("nan")) == check_parity._canon(
        float("nan")
    )


def test_canon_collapses_decimal_scale_by_design():
    from decimal import Decimal  # noqa: PLC0415

    assert check_parity._canon(Decimal("1.5000")) == check_parity._canon(
        Decimal("1.5")
    )
    assert check_parity._canon(Decimal("1.5")) != check_parity._canon(
        Decimal("1.51")
    )


def test_canon_null_distinct_from_common_empties():
    seen = {check_parity._canon(v) for v in (None, "", 0, 0.0, [], {})}
    assert len(seen) == 6
