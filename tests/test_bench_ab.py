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
