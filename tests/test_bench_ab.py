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
