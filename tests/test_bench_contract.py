"""Driver contract for bench.py: ONE JSON line with the agreed schema.

The round driver runs ``python bench.py`` and records stdout verbatim in
``BENCH_r{N}.json``; a malformed line (or a second line) silently costs the
round its perf evidence. These tests execute ``bench.main()`` with every
expensive chip rung monkeypatched so the full printing/serialization path
runs in milliseconds on any backend.
"""
from __future__ import annotations

import json
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402


@pytest.fixture
def patched(monkeypatch):
    # run the measuring path in-process: the round-5 watchdog shell would
    # otherwise re-exec bench.py in a subprocess that cannot see these
    # monkeypatches
    monkeypatch.setenv("BENCH_INNER", "1")
    monkeypatch.setattr(bench, "_probe_backend", lambda **kw: True)
    monkeypatch.setattr(bench, "bench_tpu", lambda **kw: 10.0)
    monkeypatch.setattr(bench, "bench_train_step", lambda *a, **kw: {
        "img_per_s": 200.0, "sec_per_step": 0.16,
        "flops_per_step": 2.5e13, "batch": 32})
    monkeypatch.setattr(bench, "bench_xai_trajectory", lambda *a, **kw: 30.0)
    monkeypatch.setattr(bench, "bench_xai_pipeline", lambda *a, **kw: {
        "artifacts_per_hr": 4000.0, "artifacts": 170, "wall_s": 153.0,
        "stage_seconds": {"stage1_attribution_kernels": 2.0}})
    monkeypatch.setattr(bench, "torch_cpu_per_step_seconds", lambda: 2.0)
    monkeypatch.setattr(bench, "mfu_estimate", lambda *a, **kw: 34.5)


def _strict_loads(line):
    """Parse like a strict consumer (jq / JS JSON.parse): bare NaN/Infinity
    tokens — which Python's lenient json.loads accepts — are a failure."""
    def reject(tok):
        raise AssertionError(f"non-strict JSON token in bench line: {tok}")

    return json.loads(line, parse_constant=reject)


def _run_main(capsys):
    bench.main()
    out = capsys.readouterr().out
    lines = [ln for ln in out.strip().splitlines() if ln]
    assert len(lines) == 1, f"bench must print exactly ONE line, got {lines}"
    return _strict_loads(lines[0])


def test_schema_keys(patched, capsys):
    rec = _run_main(capsys)
    for key in ("metric", "value", "unit", "vs_baseline", "extra"):
        assert key in rec, key
    assert rec["unit"] == "images/sec"
    assert isinstance(rec["value"], (int, float))
    assert isinstance(rec["extra"], dict)


def test_extra_rungs_present_and_json_clean(patched, capsys):
    rec = _run_main(capsys)
    extra = rec["extra"]
    for rung in (
        "ddpm_T1000_b8_images_per_sec",
        "dpm_solver_T20_b128_images_per_sec",
        "unipc_T20_trailing_b128_images_per_sec",
        "dpm_sde_T20_trailing_b128_images_per_sec",
        "ddim_T50_b128_cfg2_images_per_sec",
        "train_b32_images_per_sec",
        "train_mfu_pct",
        "xai_trajectory_frames_per_sec",
        "xai_pipeline_artifacts_per_hr",
    ):
        assert rung in extra, rung
    # json.dumps emits NaN (invalid JSON) unless every number is finite —
    # with all rungs healthy none may be NaN
    assert json.loads(json.dumps(rec, allow_nan=False))


def test_failed_rung_never_breaks_the_line(patched, capsys, monkeypatch):
    """A single crashing rung degrades to null-ish, not a dead bench."""
    def boom(*a, **kw):
        raise RuntimeError("rung crashed")
    monkeypatch.setattr(bench, "bench_xai_trajectory", boom)
    monkeypatch.setattr(bench, "bench_train_step", boom)
    rec = _run_main(capsys)   # _strict_loads: a bare NaN token would fail
    # headline survives; the crashed rungs serialize as strict-JSON null
    # (ADVICE r4: round(nan) used to emit a NaN token that jq/JS reject)
    assert rec["value"] == 10.0
    assert rec["extra"]["xai_trajectory_frames_per_sec"] is None
    assert rec["extra"]["train_b32_images_per_sec"] is None
    assert rec["extra"]["train_mfu_pct"] is None


def test_wedged_backend_emits_error_line(capsys, monkeypatch):
    monkeypatch.setattr(bench, "_probe_backend", lambda **kw: False)
    with pytest.raises(SystemExit):
        bench.main()
    rec = json.loads(capsys.readouterr().out.strip())
    assert rec["value"] is None and "error" in rec
