"""tools/parity_check.py — the real-data accuracy-parity harness
(VERDICT r4 #5). No COCO/MPII data exists in this environment, so these
tests prove the harness's three contracts without it: a clean SKIP when
the dataset is absent, and honest PASS/FAIL exit codes on a dataset that
does exist (synthetic)."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SMOKE_CFG = "experiments/synthetic/res18_64x64_smoke.yaml"


def _run(args, timeout=600):
    env = dict(os.environ, ADVMIX_PLATFORM="cpu", JAX_PLATFORMS="cpu",
               JAX_COMPILATION_CACHE_DIR="/tmp/jax_cache_tests")
    return subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "parity_check.py")]
        + args,
        cwd=REPO, env=env, capture_output=True, text=True, timeout=timeout,
    )


def test_skips_cleanly_when_data_absent():
    """The COCO config on this machine: exit 0 + an explicit SKIPPED
    message naming the missing root (the harness doubles as a smoke)."""
    r = _run(["--cfg", "experiments/coco/hrnet/w32_256x192_advmix.yaml",
              "--ckpt", "/tmp/definitely_missing.pth"], timeout=300)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "PARITY SKIPPED" in r.stdout
    assert "coco" in r.stdout


def test_unknown_arch_without_expectation_is_an_error():
    """Synthetic arch has no BASELINE row; without --expect_ap the harness
    must refuse (exit 2) instead of inventing a target."""
    r = _run(["--cfg", SMOKE_CFG, "--ckpt", "/tmp/none",
              "--allow_random_init"], timeout=300)
    assert r.returncode == 2, r.stdout + r.stderr
    assert "no --expect_ap" in r.stdout


@pytest.mark.slow
def test_fail_and_pass_exit_codes_on_real_validation():
    """Drives the full validate path on the synthetic dataset (random
    init, PCK a few %). An unreachable expectation exits 1 with a FAIL
    report; a beaten expectation exits 0 (beating the paper is a pass)."""
    r = _run(["--cfg", SMOKE_CFG, "--ckpt", "/tmp/none",
              "--allow_random_init", "--expect_ap", "50"])
    assert r.returncode == 1, r.stdout + r.stderr
    rep = json.loads(r.stdout.strip().splitlines()[-1])
    assert rep["result"] == "FAIL"
    assert rep["checks"][0]["metric"] == "clean AP"
    assert rep["checks"][0]["measured"] < 50

    r = _run(["--cfg", SMOKE_CFG, "--ckpt", "/tmp/none",
              "--allow_random_init", "--expect_ap", "1"])
    assert r.returncode == 0, r.stdout + r.stderr
    rep = json.loads(r.stdout.strip().splitlines()[-1])
    assert rep["result"] == "PASS"
