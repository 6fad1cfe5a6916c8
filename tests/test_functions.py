"""Engine-semantics pins for cross-engine text cliffs (round 7).

The unicode fuzz probe found exactly two Spark-vs-DuckDB divergences
in the text-function surface — both Unicode special-casing, where no
oracle formulation can reconcile a DIFFERENT output string:

- upper: Java full case mapping expands U+00DF to 'SS', while
  DuckDB/utf8proc maps it to U+1E9E (capital sharp s);
- lower: Java maps U+0130 to 'i' + combining dot above (U+0307),
  while DuckDB maps it to a bare 'i'.

Spark IS the engine, so its behavior is the contract; these pins
catch a JVM/Spark upgrade silently changing it. Special-casing code
points stay out of graded fixtures (tools/gen_fuzz_data.py's
UNI_TOKENS carries the probed-SAFE surface: NFC/NFD, astral planes,
zero-width space, fullwidth forms, NBSP — all cross-engine-identical
under length/trim/case/concat and swept by the parity harness).
"""

from __future__ import annotations

from pyspark.sql import functions as F


def test_case_mapping_engine_semantics(spark):
    df = spark.createDataFrame(
        [("straße", "İstanbul")], "a string, b string"
    )
    row = df.select(
        F.upper("a").alias("up"),
        F.lower("b").alias("lo"),
        F.length(F.upper("a")).alias("up_len"),
        F.length(F.lower("b")).alias("lo_len"),
    ).collect()[0]
    assert row["up"] == "STRASSE"  # NOT 'STRAẞE' (DuckDB's answer)
    assert row["up_len"] == 7  # case mapping CHANGES code-point length
    assert row["lo"] == "i̇stanbul"  # NOT 'istanbul' (DuckDB's answer)
    assert row["lo_len"] == 9


def test_probed_safe_surface_is_stable(spark):
    """The UNI_TOKENS surface the fuzzer rolls: code-point length and
    round-trip identity under trim/upper-lower for the categories the
    probe found cross-engine-identical."""
    words = {
        "café": 4,            # NFC
        "café": 5,           # NFD — length counts the combining mark
        "\U0001d518ni": 3,         # astral counts ONE code point, not two
        "a​b": 3,             # zero-width space is a real char
        "ＡＢ": 2,         # fullwidth
        "a b": 3,             # NBSP is not trimmed and not a space
    }
    df = spark.createDataFrame([(w,) for w in words], "s string")
    got = {
        r["s"]: (r["n"], r["t"])
        for r in df.select(
            "s", F.length("s").alias("n"), F.trim("s").alias("t")
        ).collect()
    }
    for w, n in words.items():
        assert got[w] == (n, w), (ascii(w), got[w])
