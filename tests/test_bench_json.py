"""Contract tests for bench.py's one-line stdout JSON (the driver's scoring
surface — BENCH_r{N}.json `parsed` must be non-null on every exit path).

All emission paths (normal finish, watchdog bail, SIGTERM, backend outage,
no-arm-completed) go through bench.emit(); these tests pin its shape so a
refactor can't silently break the driver's parser or let the opt-in lazy-GP
operating point (different step semantics) become the headline.
"""
import json
import sys

import pytest

sys.path.insert(0, ".")  # bench.py lives at the repo root, outside the pkg

import bench


@pytest.fixture(autouse=True)
def _no_audit_trail(tmp_path, monkeypatch):
    """emit() appends to artifacts/bench_runs.jsonl (the evidence trail for
    real runs); unit-test emissions must not land there."""
    monkeypatch.setenv("BENCH_AUDIT_PATH", str(tmp_path / "audit.jsonl"))


def _emit(capsys, *args, **kw):
    bench.emit(*args, **kw)
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1, "emit must print exactly ONE stdout line"
    return json.loads(out[0])


def test_best_arm_wins(capsys):
    p = _emit(capsys, {"a": 10.0, "b": 20.0})
    assert p["value"] == 20.0
    assert p["config"] == "b"
    assert p["unit"] == "images/sec/chip"
    assert p["vs_baseline"] == round(20.0 / bench.REF_IMAGES_PER_SEC, 2)
    assert p["all"] == {"a": 10.0, "b": 20.0}


def test_opt_in_point_never_headlines(capsys):
    """Any '(opt-in)'-labeled arm is excluded from the headline max — the
    guard that kept lazy-GP out of the headline until its round-5
    twin-quality promotion (artifacts/lazy_gp_ab/REPORT.json)."""
    results = {"bfloat16_bs128_gpbf16": 550.0,
               "bfloat16_bs128_gpbf16_lazy4(opt-in)": 700.0}
    p = _emit(capsys, results)
    assert p["config"] == "bfloat16_bs128_gpbf16"
    assert p["value"] == 550.0
    # still visible in the labeled breakdown
    assert p["all"]["bfloat16_bs128_gpbf16_lazy4(opt-in)"] == 700.0


def test_promoted_lazy_arm_headlines(capsys):
    """Post-promotion label (no '(opt-in)') IS headline-eligible: the
    bench's best-of now includes the validated lazy-GP recipe."""
    results = {"bfloat16_bs128_gpbf16": 550.0,
               "bfloat16_bs128_gpbf16_lazy4": 700.0}
    p = _emit(capsys, results)
    assert p["config"] == "bfloat16_bs128_gpbf16_lazy4"
    assert p["value"] == 700.0
    assert p["all"]["bfloat16_bs128_gpbf16"] == 550.0


def test_outage_shape(capsys):
    p = _emit(capsys, {}, error="TPU backend unavailable")
    assert p["value"] == 0.0 and p["vs_baseline"] == 0.0
    assert p["error"] == "TPU backend unavailable"
    assert p["metric"] == "images_per_sec_per_chip_256px_train_step"


def test_partial_bail_keeps_completed_arms(capsys):
    p = _emit(capsys, {"x": 42.0}, partial="time budget 2400s")
    assert p["value"] == 42.0
    assert p["partial"] == "time budget 2400s"


def test_audit_trail_record(capsys, tmp_path, monkeypatch):
    """Every emission appends a timestamped copy of the payload to the
    BENCH_AUDIT_PATH jsonl (default artifacts/bench_runs.jsonl) — the
    evidence trail that survives a lost driver capture. '0' opts out."""
    path = tmp_path / "trail.jsonl"
    monkeypatch.setenv("BENCH_AUDIT_PATH", str(path))
    p1 = _emit(capsys, {"a": 10.0})
    p2 = _emit(capsys, {}, error="TPU backend unavailable")
    recs = [json.loads(l) for l in path.read_text().splitlines()]
    assert len(recs) == 2
    assert recs[0]["value"] == p1["value"] and "utc" in recs[0]
    assert recs[1]["error"] == p2["error"]

    monkeypatch.setenv("BENCH_AUDIT_PATH", "0")
    _emit(capsys, {"a": 1.0})
    assert len(path.read_text().splitlines()) == 2  # unchanged


def test_fatal_exception_still_emits_partial_json(capsys, monkeypatch):
    """An exception escaping the arm loop (e.g. the in-process backend init
    dying AFTER the subprocess probe passed) must funnel into the bail path
    and print the one JSON line — an empty stdout is the round-3 failure
    mode this machinery exists to prevent."""
    monkeypatch.setattr(bench, "probe_backend", lambda *a, **k: True)

    def boom(results, lock):
        results["done_arm"] = 123.0
        raise RuntimeError("relay died mid-run")

    monkeypatch.setattr(bench, "_main_arms", boom)
    exits = []
    monkeypatch.setattr(bench.os, "_exit", lambda code: exits.append(code))
    # main() installs a SIGTERM handler; left in place it would swallow a
    # real SIGTERM sent to this pytest process for the rest of the suite.
    monkeypatch.setattr(bench.signal, "signal", lambda *a: None)
    bench.main()
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1
    p = json.loads(out[0])
    assert p["partial"].startswith("fatal: RuntimeError")
    assert p["value"] == 123.0  # completed arms survive the bail
    assert exits == [0]


def test_chip_queue_script_parses():
    """tools/chip_queue.sh is the detached TPU-job queue; a syntax error
    would only surface when the relay finally answers. bash -n it."""
    import subprocess
    r = subprocess.run(
        ["bash", "-n", "tools/chip_queue.sh"], capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
