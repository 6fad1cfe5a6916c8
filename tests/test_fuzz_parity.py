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

# One representative per fuzz failure family, pinned to the SEED that
# first tripped it (a family found by seed N is only red-fenced by
# seed N's value surface — seed 1 rolled 150/150 against the very code
# seed 3 broke):
KEYS = [
    # -- seed 1 harvest (round 7, 16 failures / 6 families) --
    (1, "q_corr_spearman"),   # NULL group key survives the rank LUT join
    (1, "q_agg_mad"),         # NULL group key survives the median join-back
    (1, "q_quantile_bucket"),  # NULL group key survives the ntile offsets join
    (1, "q_scrape"),          # markup-like tokens escape into the h1, round-trip
    (1, "q_fn_date"),         # fractional-second epoch floors on both engines
    (1, "q_dropna_any"),      # dropna(any) drops on EVERY column
    (1, "q_count_gate"),      # same contract through the gate CTE
    (1, "q_decontaminate"),   # NULL-text benchmark doc contributes no grams
    (1, "q_agg_salted"),      # scale-4 exact decimal sums, any partitioning
    (1, "q_win_range"),       # same, through a range-frame window
    # -- seed 3 harvest (round 7, 1 failure) --
    (3, "q_outliers"),        # Σv² squares IN DECIMAL: dec(v)·dec(v), never
    #                           dec(v·v) — the double product is inexact past
    #                           2^53 and the engines round it differently
    # -- seed 5 harvest (round 7, 1 failure) --
    (5, "q_agg_approx_percentile"),  # sketch verdict is a RANK window
    #                           (p40..p60), not a value tolerance — approx
    #                           returns an element, exact interpolates, and a
    #                           gap around a small group's median breaks any
    #                           value-percentage bound with zero rank error
    # -- timestamp-era harvest (round 7; the 1900..9999 block rolls on
    #    every seed, so these pin on seed 3, the first era sweep) --
    (3, "q_gapfill"),         # fill-step budget + explicit calendar-2024
    #                           window: min..max grids are unbounded vs
    #                           corrupt ts (one 1900/9999 pair OOM'd the JVM)
    (3, "q_agg_group"),       # DuckDB caps decimal multiply width at
    #                           max(p1,p2): sum_charge needs the explicit
    #                           DECIMAL(28,8) re-widen to stay exact
    (3, "q_fn_date"),         # epoch_us // 1000000: unix_timestamp
    #                           TRUNCATES (not floors) pre-1970 fractions;
    #                           double EPOCH() loses micros at year 9999
    (3, "q_intervals_merge"),  # plausibility horizon: a 9999 interval END
    #                           leaves the datetime-representable range
    (3, "q_stream_dedup"),    # watermark poisoning: one far-future event
    #                           silently drops all real traffic without the
    #                           declared event-time horizon
    # -- JSON-malformation harvest (round 8, seed 8: the axis' first
    #    sweep crashed q_fn_map with DUPLICATED_MAP_KEY and exposed
    #    the strict-vs-yyjson validity gap) --
    (8, "q_fn_map"),          # props contract: strict-JSON objects with
    #                           unique keys contribute entries; dup-key docs
    #                           are ambiguous (LAST_WIN vs first-match) and
    #                           contribute none; numerics compare as typed
    #                           doubles (exponent spelling diverges)
    (8, "q_variant"),         # the variant builder NULLs any dup-key doc
    #                           where json_extract reads the first match —
    #                           oracle carries the outer-dup exclusion
    (8, "q_json_roundtrip"),  # struct assembly keeps the LAST dup and an
    #                           INT field accepts only VALUE_NUMBER_INT —
    #                           dup docs follow the malformed path; oracle
    #                           gates k on json_type IN (BIGINT, UBIGINT)
    # -- numeric-string cast harvest (round 8, seed 8 cast block: raw
    #    string->INT semantics diverge in five classes — DuckDB rounds
    #    decimal strings, hex-parses 0x, accepts 4_2; legacy Spark
    #    cast truncates where DuckDB rounds) --
    (8, "q_try_cast"),        # both engines share contracts.INT_LITERAL_RE
    #                           before every graded string->INT cast
    (8, "q_fn_json"),         # same gate through get_json_object; the
    #                           legacy-cast truncation path is retired
    #                           (q_fn_map's value_num pin above also covers
    #                           the DOUBLE_LITERAL_RE whitelist: "whatever
    #                           casts" is not a cross-engine contract,
    #                           "matches the shared grammar" is)
    # -- CSV-hostile harvest (round 11, seed 11: the axis' first sweep
    #    came up 150/150 because the lossless dialect was designed from
    #    the probe corpus FIRST — tests/test_csv_contract.py; these
    #    pins keep the dialect options and the oracle's '\N'-sentinel
    #    CASE red-fenced on a fixture that provably rolls every
    #    hostile class: sentinel docs, embedded newlines/CR, lead/
    #    trail whitespace, quotes, commas, '' vs NULL) --
    (11, "q_csv_roundtrip"),  # lossless-dialect round-trip of documents;
    #                           drop any CSV_LOSSLESS_* option and this
    #                           goes red (writer trim / row splits / ''
    #                           collapse)
    (11, "q_charclass"),      # character-class profiling now sees
    #                           control chars (\n \r \t) in text — the
    #                           class counts must agree cross-engine
    (11, "q_jsonl_roundtrip"),  # the JSONL hand-off over the same
    #                           hostile docs — no dialect needed (JSON
    #                           escapes everything and has a real null)
    # -- HTML-malformation harvest (round 12, seed 13: the axis' first
    #    sweep tripped q_project_upper on a trailing NBSP — DuckDB's
    #    default trim() eats Unicode spaces, Spark's is ASCII-space
    #    only; every graded trim is now pinned to the STRIP_WS
    #    charset on both sides) --
    (13, "q_scrape"),         # entity/tag-looking tokens and \t/NBSP/
    #                           ideographic-space title edges through the
    #                           escape -> html.parser -> charref round
    #                           trip and all 8 markup-malformation
    #                           classes (doc_id % 8); drop any contract
    #                           behavior (EOF flush, first-href,
    #                           charref spaces) and this goes red
    (13, "q_project_upper"),  # trim(text, STRIP_WS) == str.strip() ==
    #                           oracle trim-with-charset on NBSP edges
    (13, "q_media_resize"),   # ''-text docs: zero-byte payloads resize
    #                           to NULL in both modes (the r12 unified
    #                           null contract) — the oracle carries the
    #                           length(text)=0 CASE
]


@pytest.fixture(scope="module")
def fuzz_fixtures(tmp_path_factory):
    built: dict[int, tuple[str, duckdb.DuckDBPyConnection]] = {}

    def get(seed: int):
        if seed not in built:
            out = str(tmp_path_factory.mktemp(f"fuzz{seed}"))
            sys.argv, argv = ["gen", "--seed", str(seed), "--out", out], sys.argv
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
            built[seed] = (out, con)
        return built[seed]

    yield get
    for _, con in built.values():
        con.close()


@pytest.mark.parametrize(("seed", "key"), KEYS)
def test_fuzz_parity(seed, key, spark, fuzz_fixtures):
    sf_dir, con = fuzz_fixtures(seed)
    r = check_parity.check(key, sf_dir, spark, con)
    assert r["status"] in ("OK", "ROWS_ONLY"), r
