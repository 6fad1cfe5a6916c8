"""Self-test for tools/bench_ab.py (the quiet-box bench A/B gate).

Covers the round-6 ADVICE items: median-only (pre-r04) baselines must
be rejected, keys absent from the baseline or from the current registry
must produce clean exit-2 errors (not KeyError tracebacks). The bench
subprocess is stubbed — this tests the harness, not Spark.
"""

from __future__ import annotations

import importlib.util
import json
import os
import subprocess
import sys

import pytest

_TOOLS = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"
)
_spec = importlib.util.spec_from_file_location(
    "bench_ab", os.path.join(_TOOLS, "bench_ab.py")
)
bench_ab = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(bench_ab)


def _write_baseline(tmp_path, rec, wrap=True):
    p = tmp_path / "baseline.json"
    p.write_text(json.dumps({"parsed": rec} if wrap else rec))
    return str(p)


def test_load_baseline_rejects_median_only_records(tmp_path):
    """Pre-r04 records hold MEDIANS in 'queries'; comparing min-of-reps
    against them is systematically lenient, so the loader must refuse."""
    path = _write_baseline(tmp_path, {"queries": {"q_x": 1.0}})
    with pytest.raises(SystemExit, match="pre-r04"):
        bench_ab.load_baseline(path)


@pytest.mark.parametrize("wrap", [True, False])
def test_load_baseline_accepts_min_plus_median(tmp_path, wrap):
    rec = {"queries": {"q_x": 1.0}, "queries_median": {"q_x": 1.2}}
    mins, meds = bench_ab.load_baseline(_write_baseline(tmp_path, rec, wrap))
    assert mins == {"q_x": 1.0} and meds == {"q_x": 1.2}


def test_key_missing_from_baseline_exits_2(tmp_path, monkeypatch, capsys):
    rec = {"queries": {"q_x": 1.0}, "queries_median": {"q_x": 1.2}}
    path = _write_baseline(tmp_path, rec)
    monkeypatch.setattr(
        sys, "argv", ["bench_ab.py", "--baseline", path, "--keys", "q_x,q_gone"]
    )
    assert bench_ab.main() == 2
    assert "q_gone" in capsys.readouterr().err


def _stub_bench(
    monkeypatch, queries: dict, medians: dict, calibration: dict | None = None
) -> None:
    """Replace the bench.py subprocess with a canned one-line result."""
    rec = {"queries": queries, "queries_median": medians}
    if calibration is not None:
        rec["calibration"] = calibration

    def fake_run(*a, **kw):
        class P:
            returncode = 0
            stderr = ""
            stdout = json.dumps(rec)

        return P()

    monkeypatch.setattr(subprocess, "run", fake_run)


def test_key_dropped_by_registry_filter_exits_2(tmp_path, monkeypatch, capsys):
    """A key in the baseline but not in plans.QUERIES is silently
    skipped by bench.py; bench_ab must surface that as exit 2 with the
    key named, not a KeyError traceback."""
    rec = {
        "queries": {"q_x": 1.0, "q_dropped": 2.0},
        "queries_median": {"q_x": 1.2, "q_dropped": 2.2},
    }
    path = _write_baseline(tmp_path, rec)
    _stub_bench(monkeypatch, {"q_x": 1.0}, {"q_x": 1.1})
    monkeypatch.setattr(
        sys,
        "argv",
        ["bench_ab.py", "--baseline", path, "--keys", "q_x,q_dropped"],
    )
    assert bench_ab.main() == 2
    assert "q_dropped" in capsys.readouterr().err


def test_degraded_host_refused(tmp_path, monkeypatch, capsys):
    """A run whose calibration probes came back slow (drag_ratio over
    --max-drag) measures the HOST, not the code — bench_ab must exit 2
    instead of printing per-key numbers that could only mislead (the
    r05/r07 BENCH-poisoning class)."""
    rec = {"queries": {"q_x": 1.0}, "queries_median": {"q_x": 1.1}}
    path = _write_baseline(tmp_path, rec)
    _stub_bench(
        monkeypatch, {"q_x": 1.0}, {"q_x": 1.1}, {"drag_ratio": 2.0}
    )
    monkeypatch.setattr(
        sys, "argv", ["bench_ab.py", "--baseline", path, "--keys", "q_x"]
    )
    assert bench_ab.main() == 2
    assert "drag_ratio" in capsys.readouterr().err


def test_clean_host_drag_passes_through(tmp_path, monkeypatch, capsys):
    rec = {"queries": {"q_x": 1.0}, "queries_median": {"q_x": 1.1}}
    path = _write_baseline(tmp_path, rec)
    _stub_bench(
        monkeypatch, {"q_x": 1.05}, {"q_x": 1.1}, {"drag_ratio": 1.04}
    )
    monkeypatch.setattr(
        sys, "argv", ["bench_ab.py", "--baseline", path, "--keys", "q_x"]
    )
    assert bench_ab.main() == 0
    assert "PASS" in capsys.readouterr().out


def test_missing_calibration_still_compares(tmp_path, monkeypatch, capsys):
    """Old bench output (or a box with no committed reference) carries
    no drag_ratio — the comparison must still run, not crash."""
    rec = {"queries": {"q_x": 1.0}, "queries_median": {"q_x": 1.1}}
    path = _write_baseline(tmp_path, rec)
    _stub_bench(monkeypatch, {"q_x": 1.05}, {"q_x": 1.1})
    monkeypatch.setattr(
        sys, "argv", ["bench_ab.py", "--baseline", path, "--keys", "q_x"]
    )
    assert bench_ab.main() == 0


def test_cpu_probe_fixed_work_is_positive():
    """bench.cpu_probe measures pinned work: tiny parameters must
    return a small positive duration (sanity — the probe's cost scales
    with host speed only, and a zero/negative reading would poison
    every drag ratio built on it)."""
    import bench  # noqa: PLC0415

    t = bench.cpu_probe(reps=1, rounds=2)
    assert 0 < t < 5


def test_pass_and_flag_verdicts(tmp_path, monkeypatch, capsys):
    rec = {
        "queries": {"q_ok": 1.0, "q_slow": 1.0},
        "queries_median": {"q_ok": 1.1, "q_slow": 1.1},
    }
    path = _write_baseline(tmp_path, rec)
    _stub_bench(
        monkeypatch, {"q_ok": 1.1, "q_slow": 2.0}, {"q_ok": 1.2, "q_slow": 2.1}
    )
    monkeypatch.setattr(
        sys, "argv", ["bench_ab.py", "--baseline", path, "--keys", "q_ok,q_slow"]
    )
    assert bench_ab.main() == 1  # one FLAG => gate fails
    out = capsys.readouterr().out
    assert "PASS" in out and "FLAG" in out


# ---------------------------------------------------------------------------
# bench.py r15 multi-pass headline protocol (r14 verdict #1): passes
# bracketed by probes, contaminated passes excluded, best clean pass
# published. Pure-function tests over pick_best_clean / pass_drag.
# ---------------------------------------------------------------------------


def _cal(cpu=0.2, mem=0.05, spark=0.15, ref=True):
    rec = {"cpu_sec": cpu, "mem_sec": mem, "spark_sec": spark}
    if ref:
        rec.update(cpu_ref_sec=0.2, mem_ref_sec=0.05, spark_ref_sec=0.15)
    return rec


def test_pass_drag_uses_min_of_pre_post_vs_ref():
    import bench  # noqa: PLC0415

    # post is JVM-warm and fast; min(pre, post) / ref per probe, worst
    # probe wins: spark 0.30/0.15 = 2.0 despite a clean cpu reading.
    pre = _cal(spark=0.45)
    post = _cal(spark=0.30)
    assert bench.pass_drag(pre, post) == 2.0
    assert bench.pass_drag(_cal(ref=False), _cal(ref=False)) is None


def test_pick_best_clean_excludes_contaminated_pass():
    """The r14 bad-draw class: pass 2 is the fastest subtotal on paper
    but its probes ran 5x reference — it must be flagged dirty and the
    slower clean pass published."""
    import bench  # noqa: PLC0415

    # Sustained degradation (the r05/r07 class) inflates BOTH of a
    # pass's bracketing probes; min(pre, post) per probe means a
    # single slow boundary reading (shared with a neighbouring pass)
    # never condemns a pass by itself. Here pass 2 sits entirely
    # inside the slow window: both its brackets read spark 5x ref.
    cals = [_cal(), _cal(spark=0.75), _cal(spark=0.80), _cal()]
    recs = [
        {"pass": 1, "total": 13.0, "drag_ratio": bench.pass_drag(cals[0], cals[1])},
        {"pass": 2, "total": 11.0, "drag_ratio": bench.pass_drag(cals[1], cals[2])},
        {"pass": 3, "total": 13.5, "drag_ratio": bench.pass_drag(cals[2], cals[3])},
    ]
    best = bench.pick_best_clean(recs, cals)
    assert best["pass"] == 1
    assert [r["clean"] for r in recs] == [True, False, True]


def test_pick_best_clean_all_clean_picks_fastest():
    import bench  # noqa: PLC0415

    cals = [_cal(), _cal(), _cal()]
    recs = [
        {"pass": 1, "total": 13.0, "drag_ratio": bench.pass_drag(cals[0], cals[1])},
        {"pass": 2, "total": 12.0, "drag_ratio": bench.pass_drag(cals[1], cals[2])},
    ]
    best = bench.pick_best_clean(recs, cals)
    assert best["pass"] == 2 and all(r["clean"] for r in recs)


def test_pass_drag_max_is_pessimistic_companion():
    """drag_ratio_max uses max(pre, post) per probe — the adjudication
    channel that still shows a mid-run contamination whose drag cleared
    before the post-probe (r15 ADVICE)."""
    import bench  # noqa: PLC0415

    pre = _cal(spark=0.45)
    post = _cal(spark=0.30)
    assert bench.pass_drag_max(pre, post) == 3.0  # 0.45 / 0.15
    assert bench.pass_drag_max(_cal(ref=False), _cal(ref=False)) is None


def test_pick_best_clean_subtotal_crosscheck():
    """A pass whose bracket probes read clean (contamination started
    and cleared between them) but whose subtotal is ~2x the best-drag
    pass's must NOT be published as clean (r15 ADVICE): min(pre, post)
    drag alone would label it clean for round-over-round adjudication."""
    import bench  # noqa: PLC0415

    cals = [_cal(), _cal(), _cal(), _cal()]
    recs = [
        {"pass": 1, "total": 12.0, "drag_ratio": bench.pass_drag(cals[0], cals[1])},
        {"pass": 2, "total": 25.0, "drag_ratio": bench.pass_drag(cals[1], cals[2])},
        {"pass": 3, "total": 13.0, "drag_ratio": bench.pass_drag(cals[2], cals[3])},
    ]
    best = bench.pick_best_clean(recs, cals)
    assert best["pass"] == 1
    assert [r["clean"] for r in recs] == [True, False, True]


def test_subtotal_crosscheck_tolerates_ordinary_pass_variance():
    """PASS_TOTAL_ENVELOPE must be wider than the drag envelope:
    within one clean r15 invocation pass totals spread 1.17x, and a
    pass-1 JIT warm-up can add ~1.3x at tiny SF — ordinary variance
    like that must NOT be flagged (only the ~2x contamination class)."""
    import bench  # noqa: PLC0415

    cals = [_cal(), _cal(), _cal()]
    recs = [
        {"pass": 1, "total": 15.6, "drag_ratio": bench.pass_drag(cals[0], cals[1])},
        {"pass": 2, "total": 12.0, "drag_ratio": bench.pass_drag(cals[1], cals[2])},
    ]
    best = bench.pick_best_clean(recs, cals)
    assert best["pass"] == 2
    assert [r["clean"] for r in recs] == [True, True]


def test_subtotal_crosscheck_anchors_on_lowest_clean_total():
    """r16 ADVICE: when drags tie (the common all-clean case) the
    anchor must be the lowest-TOTAL drag-clean pass, not whichever
    pass min() returns first — anchoring on pass 1's JIT-inflated
    total raised the 1.5x envelope's base and under-flagged mid-run
    contamination. Here pass 1 carries a 2.0x draw and pass 3 a 1.9x
    draw with clean bracket probes; against the pass-2 anchor (10.0)
    both exceed 1.5x and must be flagged."""
    import bench  # noqa: PLC0415

    cals = [_cal(), _cal(), _cal(), _cal()]
    recs = [
        {"pass": 1, "total": 20.0, "drag_ratio": bench.pass_drag(cals[0], cals[1])},
        {"pass": 2, "total": 10.0, "drag_ratio": bench.pass_drag(cals[1], cals[2])},
        {"pass": 3, "total": 19.0, "drag_ratio": bench.pass_drag(cals[2], cals[3])},
    ]
    best = bench.pick_best_clean(recs, cals)
    assert best["pass"] == 2
    assert [r["clean"] for r in recs] == [False, True, False]


def test_pick_best_clean_relative_fallback_without_reference():
    """No committed calibration reference: cleanliness falls back to
    drag relative to the invocation's own best probe minima, recorded
    as drag_ratio_rel."""
    import bench  # noqa: PLC0415

    cals = [
        _cal(ref=False),
        _cal(ref=False, spark=0.60),
        _cal(ref=False, spark=0.60),
        _cal(ref=False),
    ]
    recs = [
        {"pass": 1, "total": 13.0, "drag_ratio": None},
        {"pass": 2, "total": 9.0, "drag_ratio": None},
        {"pass": 3, "total": 13.5, "drag_ratio": None},
    ]
    best = bench.pick_best_clean(recs, cals)
    # pass 2's bracket is (0.60, 0.60) -> rel drag 4.0; passes 1/3
    # each have one clean bracket side -> rel drag 1.0.
    assert best["pass"] == 1
    assert recs[1]["drag_ratio_rel"] == 4.0
    assert [r["clean"] for r in recs] == [True, False, True]


# ---------------------------------------------------------------------------
# bench.py r16 stdout emission contract (r15 verdict #1): the driver
# captures only a 2,000-char tail of stdout; BENCH_r15.json recorded
# parsed:null because the final JSON line grew to ~4.9 KB with the
# embedded per-pass record. These tests round-trip the real record
# shape through a simulated driver tail capture so the channel cannot
# silently break again.
# ---------------------------------------------------------------------------

DRIVER_TAIL_CHARS = 2_000


def _driver_tail_parse(stdout: str) -> dict:
    """Simulate the driver: keep the last 2,000 chars of stdout, take
    the last non-empty line, parse it as JSON."""
    tail = stdout[-DRIVER_TAIL_CHARS:]
    line = [ln for ln in tail.splitlines() if ln.strip()][-1]
    return json.loads(line)


def _realistic_headline_record() -> dict:
    """The exact record shape main() emits, at the real 23-key headline
    set, with pessimistic value widths (two integer digits + three
    decimals everywhere, worst-case drag/probe widths)."""
    import bench  # noqa: PLC0415

    keys = [*bench.HEADLINE, bench.PRUNE_KEY, bench.BUCKET_KEY]
    queries = {k: 12.345 for k in keys}
    medians = {k: 14.999 for k in keys}
    calibration = {}
    for k in bench.PROBES:
        calibration[f"{k}_sec_pre"] = 0.1234
        calibration[f"{k}_sec_post"] = 0.1234
        calibration[f"{k}_ref_sec"] = 0.1234
    calibration["drag_ratio"] = 1.135
    runs_summary = [
        {
            "pass": p,
            "total": 15.456,
            "drag": 1.135,
            "drag_max": 11.234,
            "clean": False,
        }
        for p in (1, 2, 3)
    ]
    return {
        "metric": "headline_queries_total_sec",
        "value": 12.345,
        "unit": "sec",
        "queries": queries,
        "queries_median": medians,
        "sf": 0.1,
        "calibration": calibration,
        "headline_policy": (
            "best clean pass of 3 (per-key min of 3 reps); pass 3 published"
        ),
        "runs_summary": runs_summary,
    }


def test_headline_line_fits_driver_tail_with_all_fields():
    """The full 23-key record must fit the budget WITHOUT invoking the
    degradation ladder — runs_summary and queries_median present."""
    import bench  # noqa: PLC0415

    line = bench.headline_line(_realistic_headline_record())
    assert len(line) <= bench.STDOUT_LINE_BUDGET
    rec = json.loads(line)
    assert "runs_summary" in rec and "queries_median" in rec

    # Round-trip through the simulated driver capture with 10 KB of
    # preceding stdout noise (the r15 failure mode: a final line that
    # starts before the tail window opens).
    stdout = ("spark noise line\n" * 600) + line + "\n"
    parsed = _driver_tail_parse(stdout)
    assert parsed["value"] == 12.345
    assert len(parsed["queries"]) == 23
    assert parsed["calibration"]["drag_ratio"] == 1.135


def test_headline_line_degradation_ladder(capsys):
    """Forced over budget (a future 200-key headline set), the ladder
    drops runs_summary first, then queries_median — never value /
    queries / sf / calibration — and says so on stderr."""
    import bench  # noqa: PLC0415

    rec = _realistic_headline_record()
    rec["queries"] = {f"q_padded_key_name_{i:03d}": 12.345 for i in range(40)}
    rec["queries_median"] = {k: 14.999 for k in rec["queries"]}
    line = bench.headline_line(rec)
    assert len(line) <= bench.STDOUT_LINE_BUDGET
    out = json.loads(line)
    assert "runs_summary" not in out and "queries_median" not in out
    for field in ("value", "queries", "sf", "calibration"):
        assert field in out
    assert "dropped" in capsys.readouterr().err


def test_headline_line_terminal_fallback_always_parses(capsys):
    """r16 ADVICE: when the ladder runs out of droppable fields (the
    never-dropped 'queries' dict itself over budget — e.g. a future
    300-key headline set), headline_line must emit a minimal
    metric/value/unit/sf/calibration record rather than silently
    returning an over-budget line that the driver's 2,000-char tail
    truncates back into parsed:null."""
    import bench  # noqa: PLC0415

    rec = _realistic_headline_record()
    rec["queries"] = {f"q_padded_key_name_{i:03d}": 12.345 for i in range(300)}
    rec["queries_median"] = {k: 14.999 for k in rec["queries"]}
    line = bench.headline_line(rec)
    assert len(line) <= bench.STDOUT_LINE_BUDGET
    assert "\n" not in line
    out = json.loads(line)
    assert out["value"] == 12.345 and out["metric"] == rec["metric"]
    assert out["sf"] == 0.1 and "calibration" in out
    err = capsys.readouterr().err
    assert "minimal" in err

    # And it survives the simulated driver tail capture.
    stdout = ("spark noise line\n" * 600) + line + "\n"
    parsed = _driver_tail_parse(stdout)
    assert parsed["value"] == 12.345


def test_headline_line_emits_single_line():
    """The driver parses ONE line: the serialization must contain no
    newlines regardless of content."""
    import bench  # noqa: PLC0415

    line = bench.headline_line(_realistic_headline_record())
    assert "\n" not in line
