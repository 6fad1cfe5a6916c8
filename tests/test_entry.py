"""Smoke tests for the driver contract (__spark_entry__)."""

from __future__ import annotations

import __spark_entry__ as entrymod


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "sum_qty" in df.columns and "count_order" in df.columns
    # Pricing summary over A/N/R x F/O: at most 6 groups, all counts positive.
    assert all(r["count_order"] > 0 for r in rows)


def test_registry_contract(spark):
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert qs, "no queries registered"
    # Every oracle key must have a query.
    assert set(oracles) <= set(qs)


def test_flagship_deterministic(spark, sf_dir):
    qs = entrymod.queries()
    a = qs["q_agg_group"](spark, sf_dir).collect()
    b = qs["q_agg_group"](spark, sf_dir).collect()
    assert a == b
