#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

``value`` is the sum of per-query wall-clock seconds from the BEST
CLEAN PASS; each per-query number is the MINIMUM of
``SPARK_GRAFT_BENCH_REPS`` (default 3) runs within that pass, after a
discarded warmup in pass 1. Round 4 moved the per-key aggregate from
median to min: this box is multi-tenant, and repeated runs of an
identical 0.5-second plan sporadically stall for 10-20 s (observed on
several keys, uncorrelated with the query, absent when the same query
loops on an idle machine) — under such one-sided contamination the
median of a small sample is itself polluted whenever two samples
stall, while the min estimates the intrinsic plan cost (the same
reasoning as Python's ``timeit`` docs).

Round 15 made the whole INVOCATION min-of-N (r14 verdict #1): a single
pass over the key list is itself one draw from a 12.9-15.6 s spread on
identical code (the r14 four-run record; one run was 29.8 s with an
in-run calibration probe at 5.4x reference), so one invocation now
runs ``SPARK_GRAFT_BENCH_PASSES`` (default 3) full passes, brackets
EVERY pass with the fixed-work host probes, marks passes whose probes
sit outside the envelope as contaminated, and publishes the best CLEAN
pass as the headline. At least one pass is always clean (the one with
the lowest drag). ``queries``/``queries_median``/``calibration`` keep
their r4+ shapes (from the headline pass) for tools/bench_ab.py
compatibility; per-key values remain min-of-reps-within-one-pass, so
they stay comparable with BENCH_r04..r14.

Round 16 fixed the emission contract (r15 verdict #1): the driver
captures only a 2,000-char TAIL of stdout, and r15's embedding of the
complete per-pass record under ``runs`` grew the final JSON line to
~4.9 KB — BENCH_r15.json recorded ``parsed: null`` and the round had
no official headline. The stdout line now carries a compact
``runs_summary`` (per-pass total / drag / max-bracket drag / clean
flag only) and is serialized through :func:`headline_line`, which
enforces a 1,900-char budget with a deterministic degradation ladder;
the full per-pass record (per-key times per pass plus every probe
bracket) goes to stderr as a ``# runs_full:`` line instead.

Every raw sample plus the median is still printed to stderr. The
action is a count+checksum collect of the full result (no driver
materialization of wide rows). Env knobs: SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1), SPARK_GRAFT_CPUS (default *),
SPARK_GRAFT_BENCH_KEYS (csv subset), SPARK_GRAFT_BENCH_REPS (default
3 per pass), SPARK_GRAFT_BENCH_PASSES (default 3).
"""

from __future__ import annotations

import json
import os
import re
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pipeline_airflow_docker_spark import plans  # noqa: E402
from pipeline_airflow_docker_spark.session import get_spark  # noqa: E402

# ------------------------------------------------------------------
# Host-drag calibration (round 8). Two of seven official BENCH records
# (r05, r07) were contaminated by multi-tenant host degradation —
# untouched keys with byte-identical plans measured 1.5-2.5x slower,
# and each time a round of adjudication was spent proving the code
# innocent. The fix: every bench run measures two FIXED-WORK probes
# (whose cost depends only on host speed, never on this repo's code)
# before and after the query loop and reports the ratio against a
# committed clean-host reference (tools/bench_calibration.json,
# recorded by tools/record_calibration.py). drag_ratio ~1.0 = numbers
# comparable across rounds; >>1 = the HOST is slow and the run's
# numbers must not be read as a code regression. tools/bench_ab.py
# refuses to compare when the ratio exceeds its envelope.
# ------------------------------------------------------------------
CALIBRATION_REF = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "tools", "bench_calibration.json"
)


def cpu_probe(reps: int = 5, rounds: int = 256) -> float:
    """Single-core fixed-work probe: sha256 over a deterministic 1 MiB
    buffer, ``rounds`` times (~256 MiB hashed at C speed, allocation
    free). Returns the min across ``reps`` — the same intrinsic-cost
    estimator the bench itself uses."""
    import hashlib  # noqa: PLC0415

    buf = bytes(range(256)) * 4096  # 1 MiB, deterministic
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(rounds):
            hashlib.sha256(buf).digest()
        best = min(best, time.perf_counter() - t0)
    return best


def mem_probe(reps: int = 5, rounds: int = 16) -> float:
    """Memory-bandwidth fixed-work probe: 64 MiB buffer copied
    ``rounds`` times (~1 GiB moved, far past L3 so it measures DRAM
    bandwidth — a host-drag dimension neither the sha256 loop nor the
    codegen job sees, and the one a noisy co-tenant saturates first)."""
    import numpy as np  # noqa: PLC0415

    src = np.zeros(64 * 1024 * 1024, dtype=np.uint8)
    dst = np.empty_like(src)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(rounds):
            np.copyto(dst, src)
        best = min(best, time.perf_counter() - t0)
    return best


def spark_probe(spark, reps: int = 3) -> float:
    """Fixed-work canonical Spark job on the bench session: 32-part
    range -> xxhash64 -> sum (pure whole-stage codegen, no I/O, no
    shuffle beyond the 32-row reduce). Captures JVM task-scheduling
    and parallel-compute drag that the single-core probe cannot see.
    One discarded warmup pays this plan's codegen compile."""
    from pyspark.sql import functions as F  # noqa: PLC0415

    def run() -> float:
        t0 = time.perf_counter()
        spark.range(0, 200_000_000, 1, 32).agg(
            F.sum(F.xxhash64("id")).alias("h")
        ).collect()
        return time.perf_counter() - t0

    run()  # codegen warmup, discarded
    return min(run() for _ in range(reps))


PROBES = ("cpu", "mem", "spark")

# A pass is "clean" when its drag sits within this factor of the best
# pass's drag — wide enough that ordinary probe jitter (a few %) never
# splits passes, narrow enough that the r14 bad-draw class (probe 5.4x
# reference while clean runs sat at ~1.14x) is always excluded.
PASS_DRAG_ENVELOPE = 1.25

# Separate, wider envelope for the subtotal cross-check: pass totals
# carry real plan-execution variance that fixed-work probes don't
# (13.2-15.4 s = 1.17x observed within ONE clean r15 invocation, and
# pass-1 JIT warm-up can add ~1.3x at tiny SF), while the
# contamination class being caught is ~2x (r14: 29.8 s vs ~13 s
# clean). 1.5 splits those cleanly.
PASS_TOTAL_ENVELOPE = 1.5


def pass_drag(pre: dict, post: dict) -> float | None:
    """Drag for one pass bracketed by probe records ``pre``/``post``.

    Per probe, compare min(pre, post) to the committed reference: the
    post probe runs JVM-warm (comparable to the reference's recorded
    minima — the spark probe's JIT tail spans ~10 executions, so a
    fresh-session pre reading is legitimately slower), while SUSTAINED
    host degradation — the r05/r07 class, which lasted hours —
    inflates both sides. Transient mid-run noise is already absorbed
    by each key's min-of-reps. Overall ratio = worst probe. ``None``
    when no reference is committed."""
    if not all(pre.get(f"{k}_ref_sec") for k in PROBES):
        return None
    return round(
        max(
            min(pre[f"{k}_sec"], post[f"{k}_sec"]) / pre[f"{k}_ref_sec"]
            for k in PROBES
        ),
        3,
    )


def pass_drag_max(pre: dict, post: dict) -> float | None:
    """Pessimistic companion to :func:`pass_drag` for adjudication
    (r15 ADVICE): per probe, compare max(pre, post) to the committed
    reference. A pass contaminated mid-run whose drag clears before
    the post-probe reads clean under min(pre, post); it shows here.
    Not used for the clean/contaminated verdict (the pre side of a
    fresh-JVM pass is legitimately slower, so max-based drag
    over-condemns) — recorded alongside so a suspicious per-pass
    record can be re-adjudicated round-over-round."""
    if not all(pre.get(f"{k}_ref_sec") for k in PROBES):
        return None
    return round(
        max(
            max(pre[f"{k}_sec"], post[f"{k}_sec"]) / pre[f"{k}_ref_sec"]
            for k in PROBES
        ),
        3,
    )


def pick_best_clean(pass_recs: list[dict], cals: list[dict]) -> dict:
    """Mark each pass record clean/contaminated in place and return
    the headline pass: lowest subtotal among clean passes.

    Clean = the pass's drag sits within PASS_DRAG_ENVELOPE of the best
    pass's (absolute drag vs the committed reference when available;
    otherwise drag RELATIVE to the invocation-wide best probe minima,
    recorded as ``drag_ratio_rel``). The best-drag pass is clean by
    construction, so a headline always exists; a pass like r14's
    29.8 s draw (spark probe 5.4x reference) is recorded but never
    published as the headline."""
    drags = [r["drag_ratio"] for r in pass_recs]
    if not all(d is not None for d in drags):
        best_probe = {
            k: min(
                min(cals[i][f"{k}_sec"], cals[i + 1][f"{k}_sec"])
                for i in range(len(pass_recs))
            )
            for k in PROBES
        }
        drags = [
            max(
                min(cals[i][f"{k}_sec"], cals[i + 1][f"{k}_sec"])
                / best_probe[k]
                for k in PROBES
            )
            for i in range(len(pass_recs))
        ]
        for r, d in zip(pass_recs, drags):
            r["drag_ratio_rel"] = round(d, 3)
    floor = min(drags)
    # Anchor = the lowest-TOTAL pass among drag-clean passes. Its
    # subtotal cross-checks the drag verdict (r15 ADVICE): a pass
    # contaminated mid-run whose probes cleared before the post-probe
    # reads clean under min(pre, post), but its subtotal still carries
    # the inflation — flag it when the total exceeds the anchor's by
    # PASS_TOTAL_ENVELOPE. Anchoring on min-DRAG alone (r16 ADVICE)
    # under-flagged: when drags tie — the common all-clean case —
    # min() picked pass 1, whose total carries the ~1.3x JIT warm-up
    # at tiny SF, inflating the 1.5x envelope's base. The anchor is
    # drag-clean with the lowest clean total, so it satisfies both
    # conditions by construction and a headline always exists; the
    # cross-check can never steal the headline either (a pass with a
    # lower total than the anchor's cannot be drag-clean-and-cheaper
    # than the anchor, which is minimal), only correct the published
    # clean flags.
    drag_clean = [
        r for r, d in zip(pass_recs, drags) if d <= floor * PASS_DRAG_ENVELOPE
    ]
    anchor = min(drag_clean, key=lambda r: r["total"])
    for r, d in zip(pass_recs, drags):
        r["clean"] = (
            d <= floor * PASS_DRAG_ENVELOPE
            and r["total"] <= anchor["total"] * PASS_TOTAL_ENVELOPE
        )
    return min(
        (r for r in pass_recs if r["clean"]), key=lambda r: r["total"]
    )


# The driver records only a 2,000-char tail of stdout; the final JSON
# line (plus its newline) must fit inside it or the round's official
# headline is lost (BENCH_r15: parsed null). 1,900 leaves margin for
# the newline and any trailing driver framing.
STDOUT_LINE_BUDGET = 1_900


def headline_line(record: dict) -> str:
    """Serialize the driver-facing headline record to ONE stdout line,
    enforcing STDOUT_LINE_BUDGET with a deterministic degradation
    ladder: drop ``runs_summary`` first (recoverable from the stderr
    ``# runs_full:`` record), then ``queries_median`` (recoverable the
    same way); ``value``/``queries``/``sf``/``calibration`` are never
    dropped. At the 23-key headline set the full record measures
    ~1.7 KB, so the ladder is a guard against future field growth, not
    an expected path — a dropped field is reported on stderr."""
    rec = dict(record)
    line = json.dumps(rec)
    for field in ("runs_summary", "queries_median"):
        if len(line) <= STDOUT_LINE_BUDGET:
            break
        if field in rec:
            del rec[field]
            print(
                f"# headline_line: dropped '{field}' to fit the driver's"
                f" stdout tail budget ({len(line)} chars > "
                f"{STDOUT_LINE_BUDGET}); full record is on stderr",
                file=sys.stderr,
            )
            line = json.dumps(rec)
    if len(line) > STDOUT_LINE_BUDGET:
        # Terminal rung (r16 ADVICE): the ladder is out of droppable
        # fields — e.g. a future larger headline set inflating the
        # never-dropped 'queries' dict. Emit a minimal always-parseable
        # record rather than silently recreating the r15 parsed:null
        # driver failure; the full record is on stderr regardless.
        minimal = {
            k: rec[k]
            for k in ("metric", "value", "unit", "sf", "calibration")
            if k in rec
        }
        print(
            f"# headline_line: record still {len(line)} chars > "
            f"{STDOUT_LINE_BUDGET} after the ladder; emitting minimal "
            "record (metric/value/unit/sf/calibration) — per-query "
            "times are on stderr in '# runs_full:'",
            file=sys.stderr,
        )
        line = json.dumps(minimal)
    return line


def calibration_record(spark) -> dict:
    """Measure both probes now and fold in the committed clean-host
    reference. ``drag_ratio`` is the max over probes of measured/ref
    (worst-case slowdown); null when no reference is committed."""
    rec = {
        "cpu_sec": round(cpu_probe(), 4),
        "mem_sec": round(mem_probe(), 4),
        "spark_sec": round(spark_probe(spark), 4),
    }
    try:
        with open(CALIBRATION_REF) as fh:
            ref = json.load(fh)
        for k in ("cpu", "mem", "spark"):
            rec[f"{k}_ref_sec"] = ref[f"{k}_sec"]
        rec["drag_ratio"] = round(
            max(
                rec[f"{k}_sec"] / ref[f"{k}_sec"]
                for k in ("cpu", "mem", "spark")
            ),
            3,
        )
    except (OSError, ValueError, KeyError, ZeroDivisionError):
        rec["drag_ratio"] = None
    return rec

# Headline set: one per operator family (scan+filter, agg, joins of
# each shape, window, top-k, set ops, functions, UDF boundary), plus
# the LLM-pipeline north-star path (minhash dedup, chunking, ANN).
# The KEY LIST is kept stable across rounds; the per-key VALUE
# definition changed in round 4 (median-of-3 -> min-of-5 after warmup,
# concurrent with moving spark.local.dir to /dev/shm), so "value" /
# "queries" in BENCH_r04+ are NOT directly comparable to earlier
# rounds' medians — round-over-round comparisons must use
# "queries_median" against prior rounds' medians, on the shared keys.
HEADLINE = [
    "q_agg_group",       # grouped multi-aggregate (flagship, TPC-H Q1 shape)
    "q_filter_pred",     # pushdown filter scan
    "q_join_inner",      # 4-way join + agg (TPC-H Q5 shape)
    "q_join_outer",      # left outer + double agg (Q13 shape)
    "q_join_asof",       # as-of join via single window pass
    "q_agg_distinct",    # exact count-distinct
    "q_agg_rollup",      # grouping sets
    "q_topk",            # TakeOrderedAndProject
    "q_win_rank",        # ranking windows
    "q_win_frame",       # analytic windows with frames
    "q_setops",          # intersect/except
    "q_fn_math",         # scalar function pack over widest table
    "q_udf",             # Arrow pandas-UDF boundary
    "q_dedup_minhash",   # MinHash+LSH near-dup pairs over documents
    "q_chunk_docs",      # document chunking (explode, zero shuffle)
    "q_knn_lsh",         # sign-LSH bucketed ANN over embeddings
    "q_sessionize",      # gap sessionization (single-shuffle window, round 3)
    "q_stream_bounded",  # AvailableNow micro-batch consume (round 3)
    "q_corr_spearman",   # rank statistics: 2-axis sort + moments (round 4)
    "q_intervals_merge", # gaps-and-islands coalesce, single shuffle (round 4)
    "q_mix_temperature", # corpus mixture: broadcast-bound map-side keep (round 4)
]

# Partition-pruning bench: timed over a partitioned copy of `events`
# written (untimed) to scratch. Guarded by a plan assertion — the bench
# FAILS if the day filter stops pruning partitions, so SCALE.md §2's
# layout claim is continuously proven, not just stated.
PRUNE_KEY = "q_part_prune"

# Bucketed co-located join bench: lineitem and orders bucketed by
# orderkey (untimed setup), then a fact-fact join + aggregate that must
# plan with ZERO Exchange operators — the shuffle-free join bucketing
# buys at 100 TB, asserted every bench run.
BUCKET_KEY = "q_bucket_join"


def _explain(df) -> str:
    return df.sparkSession._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def _setup_partitioned_events(spark, sf_dir: str, scratch: str) -> str:
    from pyspark.sql import functions as F  # noqa: PLC0415

    from pipeline_airflow_docker_spark.catalog import table  # noqa: PLC0415
    from pipeline_airflow_docker_spark.sinks.batch import (  # noqa: PLC0415
        write_parquet_partitioned,
    )

    path = os.path.join(scratch, "events_by_day")
    events = table(spark, sf_dir, "events").withColumn(
        "event_date", F.to_date("ts")
    )
    write_parquet_partitioned(events, path, ["event_date"])
    return path


def _partition_prune_query(spark, part_path: str):
    from pyspark.sql import functions as F  # noqa: PLC0415

    return (
        spark.read.parquet(part_path)
        .where(F.col("event_date") == F.lit("2024-01-15").cast("date"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("total_value"),
        )
    )


def _setup_bucketed_tables(spark, sf_dir: str, scratch: str) -> None:
    from pipeline_airflow_docker_spark.catalog import table  # noqa: PLC0415
    from pipeline_airflow_docker_spark.sinks.batch import write_bucketed  # noqa: PLC0415

    for name, cols in (
        ("lineitem", ["l_orderkey"]),
        ("orders", ["o_orderkey"]),
    ):
        write_bucketed(
            table(spark, sf_dir, name),
            f"bench_{name}_b",
            cols,
            n_buckets=8,
            sort_cols=cols,
            path=os.path.join(scratch, f"{name}_b"),
        )


def _bucket_join_query(spark):
    from pyspark.sql import functions as F  # noqa: PLC0415

    li = spark.table("bench_lineitem_b")
    o = spark.table("bench_orders_b")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(F.col("l_quantity").cast("decimal(18,4)"))
            .cast("double")
            .alias("sum_qty"),
        )
    )


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
    passes = int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "3"))

    keys_env = os.environ.get("SPARK_GRAFT_BENCH_KEYS")
    wanted = keys_env.split(",") if keys_env else [*HEADLINE, PRUNE_KEY, BUCKET_KEY]
    keys = [
        k for k in wanted if k in plans.QUERIES or k in (PRUNE_KEY, BUCKET_KEY)
    ]

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Session warm-up (NOT query warm-up — each query still pays its
    # own codegen/compile inside its timing): prime the parquet file
    # index + footers for every table, the Python/Arrow worker pool,
    # and one trivial job for JVM spin-up. On a long-lived cluster all
    # of this is amortized session state, not per-query cost.
    from pyspark.sql import functions as _F  # noqa: PLC0415

    from pipeline_airflow_docker_spark.catalog import TABLES, table  # noqa: PLC0415

    for t in TABLES:
        table(spark, sf_dir, t).select(_F.lit(1)).limit(1).collect()
    warm = spark.range(32).select(
        _F.pandas_udf(lambda s: s + 1, "long")(_F.col("id")).alias("x")
    )
    warm.collect()
    plans.QUERIES["q_topk"](spark, sf_dir).collect()

    cal_pre = calibration_record(spark)
    print(f"# calibration (pre): {cal_pre}", file=sys.stderr)

    scratch = None
    part_path = None
    if PRUNE_KEY in keys or BUCKET_KEY in keys:
        scratch = tempfile.mkdtemp(prefix="spark_graft_bench_")
    if PRUNE_KEY in keys:
        part_path = _setup_partitioned_events(spark, sf_dir, scratch)
        plan = _explain(_partition_prune_query(spark, part_path))
        # Hard gate: the day predicate must prune at the partition
        # level (PartitionFilters on event_date), not post-scan.
        if "PartitionFilters" not in plan or "event_date" not in plan.split(
            "PartitionFilters", 1
        )[1].split("]", 1)[0]:
            print(plan, file=sys.stderr)
            raise AssertionError(
                f"{PRUNE_KEY}: day filter is not a PartitionFilter — "
                "partition pruning regressed"
            )
    prev_bcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    if BUCKET_KEY in keys:
        _setup_bucketed_tables(spark, sf_dir, scratch)
        # The co-location demo needs the broadcast path off: at bench
        # SF the orders side fits under the broadcast threshold, but at
        # 100 TB neither side broadcasts — the property being proven is
        # the Exchange-free sort-merge join. Scoped to this key only
        # (set again around its timing below, restored in between).
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            plan = _explain(_bucket_join_query(spark))
            # The final groupBy (not on the bucket key) legitimately
            # shuffles its few aggregate rows; the JOIN subtree — in
            # the formatted tree, everything under SortMergeJoin —
            # must be Exchange-free.
            tree = plan.split("\n\n")[0]
            join_subtree = tree.split("SortMergeJoin", 1)[-1]
            if "SortMergeJoin" not in tree or "Exchange" in join_subtree:
                print(plan, file=sys.stderr)
                raise AssertionError(
                    f"{BUCKET_KEY}: bucketed fact-fact join shuffles its "
                    "inputs — co-located join regressed"
                )
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_bcast)

    def build(name: str):
        if name == PRUNE_KEY:
            return _partition_prune_query(spark, part_path)
        if name == BUCKET_KEY:
            return _bucket_join_query(spark)
        return plans.QUERIES[name](spark, sf_dir)

    import gc  # noqa: PLC0415

    # cals[i] brackets pass i as its pre-probe and pass i-1 as its
    # post-probe: probes between passes serve both neighbours, so N
    # passes cost N+1 probe measurements, not 2N.
    cals = [cal_pre]
    pass_recs: list[dict] = []
    try:
        for p in range(passes):
            timings: dict[str, float] = {}
            medians: dict[str, float] = {}
            for name in keys:
                if name == BUCKET_KEY:
                    spark.conf.set(
                        "spark.sql.autoBroadcastJoinThreshold", "-1"
                    )
                samples = []
                n = 0

                def run_once(name=name):
                    df = build(name)
                    # Action = JVM-side row count + xxhash64 checksum
                    # over every output column: forces full computation
                    # of the plan (a bare count() would let Catalyst
                    # prune computed columns away) while moving exactly
                    # one row to the driver (collect() of a wide result
                    # would time Python pickling, not the engine).
                    return df.select(
                        _F.count(_F.lit(1)).alias("n"),
                        _F.sum(
                            _F.xxhash64(*[_F.col(c) for c in df.columns])
                        ).alias("h"),
                    ).collect()[0]["n"]

                # Per-query warmup rep in pass 1 only, discarded: first
                # execution pays codegen compile, checkpoint/cache
                # materialization, and (on a shared box) cold page
                # cache — one-time costs a long-lived cluster
                # amortizes. r02 showed medians like [38.9/28.6/1.4]
                # without it, useless as a round-over-round signal. The
                # warmup cost is printed so cold cost stays visible
                # instead of hidden; passes 2+ are warm by
                # construction (every key already ran 1+reps times).
                warm_sec = None
                if p == 0:
                    t0 = time.time()
                    run_once()
                    warm_sec = time.time() - t0
                for _ in range(reps):
                    # Drop the previous rep's DataFrame references NOW
                    # so ContextCleaner reclaims any localCheckpoint
                    # blocks before (not during) the next timed run.
                    gc.collect()
                    t0 = time.time()
                    n = run_once()
                    samples.append(time.time() - t0)
                if name == BUCKET_KEY:
                    spark.conf.set(
                        "spark.sql.autoBroadcastJoinThreshold", prev_bcast
                    )
                timings[name] = round(min(samples), 3)
                medians[name] = round(statistics.median(samples), 3)
                detail = "/".join(f"{s:.2f}" for s in samples)
                warm_note = (
                    f", warmup {warm_sec:.2f}s" if warm_sec is not None else ""
                )
                print(
                    f"# [pass {p + 1}/{passes}] {name}: min {timings[name]}s"
                    f" / median {medians[name]}s of [{detail}]"
                    f" ({n} rows{warm_note})",
                    file=sys.stderr,
                )
            cals.append(calibration_record(spark))
            print(
                f"# calibration (after pass {p + 1}): {cals[-1]}",
                file=sys.stderr,
            )
            pass_recs.append({
                "pass": p + 1,
                "total": round(sum(timings.values()), 3),
                "queries": timings,
                "queries_median": medians,
                "drag_ratio": pass_drag(cals[p], cals[p + 1]),
                "drag_ratio_max": pass_drag_max(cals[p], cals[p + 1]),
            })
    finally:
        if scratch:
            shutil.rmtree(scratch, ignore_errors=True)

    best = pick_best_clean(pass_recs, cals)
    idx = best["pass"] - 1
    cal_best_pre, cal_best_post = cals[idx], cals[idx + 1]

    calibration = {}
    for k in PROBES:
        calibration[f"{k}_sec_pre"] = cal_best_pre[f"{k}_sec"]
        calibration[f"{k}_sec_post"] = cal_best_post[f"{k}_sec"]
        calibration[f"{k}_ref_sec"] = cal_best_pre.get(f"{k}_ref_sec")
    calibration["drag_ratio"] = best["drag_ratio"]
    # r18 (PERF_r17 scaling block read suspect_cpus_ignored): nothing
    # in the output proved $SPARK_GRAFT_CPUS was honored — at sf0.1
    # every key is floor-bound, so 8- vs 32-core TIMES cannot tell the
    # master apart. Emit the session's effective parallelism in the
    # never-dropped calibration record so the driver can verify the
    # core count directly instead of inferring it from wall clock.
    calibration["cpus_effective"] = spark.sparkContext.defaultParallelism

    # Full per-pass record (per-key times and medians of every pass,
    # every probe bracket) — too big for the driver's stdout tail, so
    # it lives on stderr for round-over-round adjudication.
    print(
        "# runs_full: "
        + json.dumps({"runs": pass_recs, "calibrations": cals}),
        file=sys.stderr,
    )
    runs_summary = [
        {
            "pass": r["pass"],
            "total": r["total"],
            "drag": (
                r["drag_ratio"]
                if r["drag_ratio"] is not None
                else r.get("drag_ratio_rel")
            ),
            "drag_max": r.get("drag_ratio_max"),
            "clean": r["clean"],
        }
        for r in pass_recs
    ]
    print(headline_line({
        "metric": "headline_queries_total_sec",
        "value": best["total"],
        "unit": "sec",
        "queries": best["queries"],
        "queries_median": best["queries_median"],
        "sf": sf,
        "calibration": calibration,
        "headline_policy": (
            f"best clean pass of {passes} (per-key min of {reps} reps); "
            f"pass {best['pass']} published"
        ),
        "runs_summary": runs_summary,
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
