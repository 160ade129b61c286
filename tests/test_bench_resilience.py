"""bench.py resilience to transient remote-compile relay failures
(VERDICT r4 #1): bounded retries around the compile-heavy phases,
degraded-window JSON, and the prewarm child contract.

BENCH_r04.json was lost to ONE transient relay read error inside
model.init; these tests fault-inject that exact error class
(ADVMIX_BENCH_FAULT) and prove the bench still lands a measurement.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402


# ---------------------------------------------------------------------------
# unit: error classification + retry loop
# ---------------------------------------------------------------------------

def test_is_transient_classification():
    transient = [
        RuntimeError("INTERNAL: stream::Run failed in remote_compile"),
        RuntimeError("response body closed before all bytes were read"),
        RuntimeError("UNAVAILABLE: socket closed"),
        RuntimeError("DEADLINE_EXCEEDED: relay timed out"),
    ]
    for e in transient:
        assert bench._is_transient(e), e
    non_transient = [
        RuntimeError("RESOURCE_EXHAUSTED: Attempting to reserve 16.18G"),
        RuntimeError("INVALID_ARGUMENT: shapes do not match"),
        ValueError("bad config key"),
        # OOM wins even when the relay wraps it in INTERNAL framing
        RuntimeError("INTERNAL: RESOURCE_EXHAUSTED while allocating"),
    ]
    for e in non_transient:
        assert not bench._is_transient(e), e


def test_retry_transient_retries_then_succeeds(monkeypatch):
    calls = []

    def flaky():
        calls.append(1)
        if len(calls) < 3:
            raise RuntimeError("INTERNAL: remote_compile relay hiccup")
        return "ok"

    notes = []
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    assert bench._retry_transient(flaky, "phase", notes, attempts=3) == "ok"
    assert len(calls) == 3
    assert len(notes) == 2 and all("phase" in n for n in notes)


def test_retry_transient_raises_nontransient_immediately(monkeypatch):
    calls = []

    def broken():
        calls.append(1)
        raise ValueError("a real bug")

    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    with pytest.raises(ValueError):
        bench._retry_transient(broken, "phase", [], attempts=3)
    assert len(calls) == 1  # no retry burned on a non-transient error


def test_retry_transient_exhausts_attempts(monkeypatch):
    def always_flaky():
        raise RuntimeError("UNAVAILABLE: relay down")

    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    with pytest.raises(RuntimeError, match="UNAVAILABLE"):
        bench._retry_transient(always_flaky, "phase", [], attempts=2)


def test_prewarm_gives_up_after_bounded_attempts(monkeypatch):
    rcs = []

    def fake_call(argv, env=None, stdout=None):
        rcs.append(1)
        return 1

    monkeypatch.setattr(bench.subprocess, "call", fake_call)
    assert bench._prewarm() is False
    assert len(rcs) == 2  # bounded, non-fatal


# ---------------------------------------------------------------------------
# end-to-end fault injection (CPU subprocess, tiny config)
# ---------------------------------------------------------------------------

def _bench_env(**extra):
    env = dict(os.environ)
    env.update(
        ADVMIX_PLATFORM="cpu", JAX_PLATFORMS="cpu",
        JAX_COMPILATION_CACHE_DIR="/tmp/jax_cache_tests",
        BENCH_CFG="experiments/synthetic/res18_64x64_smoke.yaml",
        BENCH_BATCH="2", BENCH_STEPS="1", BENCH_WINDOWS="1",
        BENCH_RETRY_SLEEP="0",
    )
    env.update(extra)
    return env


def _run_bench(env):
    return subprocess.run([sys.executable, "bench.py"], cwd=REPO, env=env,
                          capture_output=True, text=True, timeout=900)


@pytest.mark.slow
def test_bench_survives_injected_init_fault():
    """The exact BENCH_r04 failure shape: a transient relay error during
    state init. The retry must land a clean measurement (rc=0, value>0)."""
    r = _run_bench(_bench_env(ADVMIX_BENCH_FAULT="init:1"))
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    line = [ln for ln in r.stdout.splitlines() if ln.startswith("{")][-1]
    out = json.loads(line)
    assert out["value"] > 0
    assert any("state init" in n for n in out.get("notes", [])), out


@pytest.mark.slow
def test_bench_degrades_on_window_fault():
    """Losing one of two timing windows to a transient error reports the
    surviving window with degraded=true instead of dying."""
    r = _run_bench(_bench_env(ADVMIX_BENCH_FAULT="window:1",
                              BENCH_WINDOWS="2"))
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    line = [ln for ln in r.stdout.splitlines() if ln.startswith("{")][-1]
    out = json.loads(line)
    assert out["value"] > 0
    assert out.get("degraded") is True
    assert len(out["window_img_s_chip"]) == 1


@pytest.mark.slow
def test_bench_all_windows_lost_is_rc1_with_json():
    """When every window fails the bench exits 1 but still prints a
    machine-readable error line."""
    r = _run_bench(_bench_env(ADVMIX_BENCH_FAULT="window:1",
                              BENCH_WINDOWS="1"))
    assert r.returncode == 1, r.stdout[-2000:] + r.stderr[-2000:]
    line = [ln for ln in r.stdout.splitlines() if ln.startswith("{")][-1]
    out = json.loads(line)
    assert "error" in out


@pytest.mark.slow
def test_bench_prewarm_child_contract():
    """BENCH_PREWARM_CHILD=1 compiles + warms up, prints {"prewarm": true}
    and exits 0 without timing windows."""
    r = _run_bench(_bench_env(BENCH_PREWARM_CHILD="1"))
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    line = [ln for ln in r.stdout.splitlines() if ln.startswith("{")][-1]
    out = json.loads(line)
    assert out.get("prewarm") is True
