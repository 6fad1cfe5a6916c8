"""The PII-redaction cross-engine probe battery, pinned as a
permanent test (round 12).

The r12 probe ran the redaction chain side-by-side through Spark
(Java regex) and DuckDB (RE2) on a 34-text hostile battery and found
two root-cause divergence classes in the "common subset" spelling
(the first with two observed manifestations — non-ASCII letters and
non-ASCII digits are both Java word chars):

1. Java's bare ``\\b`` is Unicode-aware, RE2's is ASCII —
   ``é123-45-6789`` redacted as ``é<PHONE>`` on Spark, ``é<SSN>`` on
   DuckDB; fullwidth/Devanagari digits before an IPv4 suppressed the
   match on Spark only.
2. Java's ``\\s`` includes vertical tab (``\\x0B``), RE2's doesn't —
   a phone run broken by ``\\x0B`` redacted on Spark only.

operators/redact.py therefore declares the contract (ASCII word
boundaries, explicit Java whitespace set) with one spelling per
engine: Java gets zero-width ASCII lookarounds, RE2 gets its
natively-ASCII ``\\b``. These tests rerun the full battery through
BOTH engines and assert:

1. the engines agree on every battery text (so q_redact_pii is
   hash-stable by construction), and
2. the five formerly-divergent texts produce the CONTRACTED answer —
   not just any agreement — so a pattern edit that regresses either
   spelling fails with a pointer.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from pipeline_airflow_docker_spark.operators.redact import (
    PII_PATTERNS,
    oracle_redact_sql,
    redact_expr,
)

# The r12 probe battery: \s-membership edges inside the phone class,
# ASCII-vs-Unicode word-boundary edges around SSN/IPv4, email shapes,
# greedy/backtracking shapes, degenerate inputs.
BATTERY = [
    "call 12\x0b34567 89 now",
    "+1\x0b2345678",
    "12\x1c34567 89",
    "12\xa034567 89",
    "12\t34567 89",
    "12\n34567 89",
    "12\r34567 89",
    "12\x0c34567 89",
    "ssn 123-45-6789 ok",
    "x123-45-6789",
    "9123-45-6789",
    "_123-45-6789",
    "é123-45-6789",
    "\xa0123-45-6789",
    "\U0001f600123-45-6789",
    "123-45-6789",
    "123-45-6789-",
    ".1.2.3.4.",
    "１1.2.3.4",
    "०1.2.3.4",
    "a.b@c.de",
    "ü.b@c.de",
    "a@b.c.d.ee...",
    "a+b+c@d-e.f.gg",
    "(((1234567)))",
    "1.2.3.4.5.6.7.8",
    "1234567 8",
    "12345678",
    "1.2.3.4 then 123-45-6789 then 5551234567",
    "12345678@99.example.com",
    "",
    "\x0b",
    "123456",
    "123\U0001f600456789",
]

# The five texts the naive spelling diverged on, pinned to the
# CONTRACTED (ASCII-boundary, Java-whitespace) answer.
CONTRACT_PINS = {
    "call 12\x0b34567 89 now": "call <PHONE> now",
    "+1\x0b2345678": "<PHONE>",
    "é123-45-6789": "é<SSN>",
    "１1.2.3.4": "１<IPV4>",
    "०1.2.3.4": "०<IPV4>",
}


def _spark_redact(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id int, text string"
    )
    rows = df.withColumn("redacted", redact_expr(F.col("text"))).collect()
    return {r.id: r.redacted for r in rows}


def _duck_redact(texts):
    con = duckdb.connect()
    sql = f"SELECT {oracle_redact_sql('?')}"
    return {i: con.execute(sql, [t]).fetchone()[0] for i, t in enumerate(texts)}


def test_redact_chain_agrees_across_engines(spark):
    got_s = _spark_redact(spark, BATTERY)
    got_d = _duck_redact(BATTERY)
    diverged = {
        BATTERY[i]: (got_s[i], got_d[i])
        for i in range(len(BATTERY))
        if got_s[i] != got_d[i]
    }
    assert diverged == {}, f"engines disagree on {len(diverged)} texts"


def test_redact_contract_pins(spark):
    texts = list(CONTRACT_PINS)
    got_s = _spark_redact(spark, texts)
    got_d = _duck_redact(texts)
    for i, t in enumerate(texts):
        assert got_s[i] == CONTRACT_PINS[t], (t, got_s[i])
        assert got_d[i] == CONTRACT_PINS[t], (t, got_d[i])


def test_naive_spelling_still_diverges(spark):
    """The fence discriminates: the pre-r12 bare-\\b spelling still
    disagrees across engines on the pinned texts — if the engines'
    regex dialects ever converge, this fails and the per-engine
    spellings can be collapsed."""
    t = "é123-45-6789"
    naive = r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b"
    s = (
        spark.createDataFrame([(t,)], "text string")
        .select(F.regexp_replace("text", naive, "<SSN>").alias("r"))
        .collect()[0]
        .r
    )
    d = duckdb.connect().execute(
        "SELECT regexp_replace(?, ?, '<SSN>', 'g')", [t, naive]
    ).fetchone()[0]
    assert s == t  # Java: é is a word char, no boundary, no match
    assert d == "é<SSN>"  # RE2: ASCII boundary, match


def test_patterns_table_shape():
    """Application order and per-engine spellings stay aligned: email
    before ssn before ipv4 before phone (the greedy-phone-last
    invariant), and the email/phone spellings are engine-identical."""
    names = [n for n, _, _ in PII_PATTERNS]
    assert names == ["email", "ssn", "ipv4", "phone"]
    by_name = {n: (j, r) for n, j, r in PII_PATTERNS}
    assert by_name["email"][0] == by_name["email"][1]
    assert by_name["phone"][0] == by_name["phone"][1]
    # ssn/ipv4 differ only in the boundary spelling
    for n in ("ssn", "ipv4"):
        j, r = by_name[n]
        assert j.startswith("(?<![0-9A-Za-z_])") and j.endswith("(?![0-9A-Za-z_])")
        assert r.startswith(r"\b") and r.endswith(r"\b")
