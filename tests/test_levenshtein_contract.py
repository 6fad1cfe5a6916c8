"""The levenshtein cross-engine contract (round 12).

The r12 probe ran ``levenshtein`` side-by-side through Spark and
DuckDB: Spark counts CODE POINTS (UTF8String), DuckDB counts BYTES —
all eight non-ASCII probe pairs diverged ('café'/'cafe' = 1 vs 2,
'a😀b'/'ab' = 1 vs 4). q_fuzzy_join had been green only because both
its inputs happen to be ASCII — a fixture accident, the same class
the r12 case-mapping tripwire closed for upper/lower.

The declared contract (plans/dataops.py at q_fuzzy_join): the engine
keeps the codepoint semantic (correct for text); the key is graded on
the ASCII domain where the engines coincide. These tests pin:

1. agreement on an ASCII battery (the graded regime),
2. the divergence discriminator (if the engines ever converge, the
   domain restriction can be lifted),
3. an ASCII tripwire on BOTH graded inputs — the literal _TYPOS and
   every nation name in the base fixture — so a fixture roll that
   opens the non-ASCII surface fails here with a pointer.
"""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from pipeline_airflow_docker_spark.catalog import table
from pipeline_airflow_docker_spark.plans.dataops import _TYPOS

ASCII_BATTERY = [
    ("kitten", "sitting", 3),
    ("NATIN_3", "NATION_3", 1),
    ("", "abc", 3),
    ("same", "same", 0),
    ("a-b c", "a_b_c", 2),
    ("UPPER", "upper", 5),
]


def test_levenshtein_agrees_on_ascii(spark):
    df = spark.createDataFrame(ASCII_BATTERY, "a string, b string, want int")
    rows = df.select("a", "b", "want", F.levenshtein("a", "b").alias("d")).collect()
    con = duckdb.connect()
    for r in rows:
        assert r.d == r.want, (r.a, r.b, r.d)
        duck = con.execute("SELECT levenshtein(?, ?)", [r.a, r.b]).fetchone()[0]
        assert duck == r.want, (r.a, r.b, duck)


def test_levenshtein_engines_still_diverge_off_ascii(spark):
    """The fence discriminates: codepoint-vs-byte still disagrees on
    'café'/'cafe'. If this fails, the engines converged — lift the
    ASCII domain restriction at q_fuzzy_join instead of patching."""
    s = (
        spark.createDataFrame([("café", "cafe")], "a string, b string")
        .select(F.levenshtein("a", "b").alias("d"))
        .collect()[0]
        .d
    )
    d = duckdb.connect().execute(
        "SELECT levenshtein('café', 'cafe')"
    ).fetchone()[0]
    assert s == 1  # one substitution, counted in code points
    assert d == 2  # 'é' is two UTF-8 bytes


def test_graded_inputs_are_ascii(spark, sf_dir):
    """Tripwire on the fixture-domain assumption: both levenshtein
    inputs of q_fuzzy_join must stay ASCII (where the engines agree).
    The nation dim is never fuzzed by tools/gen_fuzz_data.py
    (bounded-blast-radius rule); this makes that load-bearing."""
    for t in _TYPOS:
        assert t.isascii(), t
    names = [r.n_name for r in table(spark, sf_dir, "nation").select("n_name").collect()]
    assert names and all(n.isascii() for n in names), names
