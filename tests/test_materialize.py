"""Materialization-mode knob (functions/materialize.py): every mode
must produce identical operator results — the knob trades executor
memory vs disk vs scratch-store, never semantics."""

from __future__ import annotations

import pytest

from pipeline_airflow_docker_spark.catalog import table
from pipeline_airflow_docker_spark.functions.materialize import MODES, materialize
from pipeline_airflow_docker_spark.operators.dedup import (
    minhash_dup_pairs,
    resolve_components,
)


@pytest.mark.parametrize("mode", MODES)
def test_materialize_modes_preserve_rows(spark, mode):
    df = spark.range(100).withColumnRenamed("id", "k")
    out = materialize(df, how=mode)
    assert sorted(r.k for r in out.collect()) == list(range(100))
    # dtypes round-trip exactly; nullability may widen in
    # parquet_scratch mode (file sources are always nullable in Spark).
    assert out.dtypes == df.dtypes


def test_unknown_mode_raises(spark):
    with pytest.raises(ValueError, match="unknown materialize mode"):
        materialize(spark.range(1), how="shared_memory")


def test_dedup_identical_across_modes(spark, sf_dir, monkeypatch):
    got = {}
    for mode in MODES:
        monkeypatch.setenv("SPARK_GRAFT_MATERIALIZE", mode)
        d = table(spark, sf_dir, "documents")
        pairs = minhash_dup_pairs(d, "doc_id", "text", threshold=0.8)
        comp = resolve_components(d.select("doc_id"), pairs, id_col="doc_id")
        got[mode] = (
            sorted((r.id_a, r.id_b) for r in pairs.collect()),
            sorted((r.id, r.component) for r in comp.collect()),
        )
    base = got["local_checkpoint"]
    for mode in MODES:
        assert got[mode] == base, f"mode {mode} diverged"
