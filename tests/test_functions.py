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


def test_case_mapping_divergence_classes_r14(spark):
    """r14 probe: three MORE special-casing divergence classes beyond
    r7's ß/İ — all the same policy (Spark's Java full case mapping is
    the contract; the code points stay out of graded fixtures):

    - ligatures EXPAND on Spark ('ﬁle' -> 'FILE'), stay unmapped on
      DuckDB ('ﬁLE');
    - U+0149 'ŉ' expands to ʼN on Spark, unchanged on DuckDB;
    - lower() applies the Greek FINAL-SIGMA context rule on Spark
      ('ΣΙΣΥΦΟΣ' -> trailing ς), not on DuckDB (trailing σ).

    And the AGREEMENT points that keep fuzz text safe: 1:1 mappings
    (dotless ı -> I), titlecase digraphs (ǅ), the PRE-decomposed
    ʼ + n pair, and astral pass-through."""
    import duckdb

    rows = spark.createDataFrame(
        [("ﬁle", "ŉ", "ΣΙΣΥΦΟΣ", "ıi", "ǅungla", "ʼn", "𝔘nicode")],
        "lig string, n149 string, sigma string, dotless string,"
        " digraph string, decomp string, astral string",
    ).select(
        F.upper("lig").alias("lig_u"),
        F.upper("n149").alias("n149_u"),
        F.lower("sigma").alias("sigma_l"),
        F.upper("dotless").alias("dotless_u"),
        F.upper("digraph").alias("digraph_u"),
        F.upper("decomp").alias("decomp_u"),
        F.upper("astral").alias("astral_u"),
    ).collect()[0]
    assert rows.lig_u == "FILE"        # expansion
    assert rows.n149_u == "ʼN"         # expansion
    assert rows.sigma_l == "σισυφος"   # context rule: final ς
    con = duckdb.connect()
    d = con.execute(
        "SELECT upper('ﬁle'), upper('ŉ'), lower('ΣΙΣΥΦΟΣ')"
    ).fetchone()
    assert d == ("ﬁLE", "ŉ", "σισυφοσ")  # divergence discriminators
    # agreement points — identical in DuckDB:
    agree = con.execute(
        "SELECT upper('ıi'), upper('ǅungla'), upper('ʼn'), upper('𝔘nicode')"
    ).fetchone()
    assert agree == (
        rows.dotless_u, rows.digraph_u, rows.decomp_u, rows.astral_u
    ) == ("II", "ǄUNGLA", "ʼN", "𝔘NICODE")


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
