"""tools/serve.py: the export directory is a complete deployable —
serve it over HTTP with no model code and get the same predictions the
module produces locally (incl. the partial-batch padding path)."""

import io
import json
import os
import subprocess
import sys
import time
import urllib.request

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SMOKE_CFG = "experiments/synthetic/res18_64x64_smoke.yaml"


def _env():
    env = dict(os.environ)
    env.update(
        ADVMIX_PLATFORM="cpu", JAX_PLATFORMS="cpu",
        JAX_COMPILATION_CACHE_DIR="/tmp/jax_cache_tests",
    )
    return env


@pytest.mark.slow
def test_serve_export_http_roundtrip(tmp_path):
    out = tmp_path / "export"
    r = subprocess.run(
        [sys.executable, "tools/export.py",
         "--cfg", SMOKE_CFG, "--batch", "2", "--out", str(out),
         "OUTPUT_DIR", str(tmp_path / "o"), "LOG_DIR", str(tmp_path / "l")],
        cwd=REPO, env=_env(), capture_output=True, text=True, timeout=900,
    )
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]

    log = tmp_path / "serve.log"
    proc = subprocess.Popen(
        [sys.executable, "tools/serve.py",
         "--export_dir", str(out), "--port", "0"],
        cwd=REPO, env=_env(),
        stdout=open(log, "w"), stderr=subprocess.STDOUT,
    )
    try:
        port = None
        deadline = time.time() + 600
        while time.time() < deadline:
            if proc.poll() is not None:
                raise AssertionError(
                    f"serve.py exited early:\n{log.read_text()[-3000:]}"
                )
            txt = log.read_text() if log.exists() else ""
            if "serving pose model on http://" in txt:
                port = int(txt.split(":")[-1].split()[0].strip("/"))
                break
            time.sleep(1.0)
        assert port, f"server never came up:\n{log.read_text()[-2000:]}"
        base = f"http://127.0.0.1:{port}"

        info = json.loads(
            urllib.request.urlopen(f"{base}/healthz", timeout=60).read()
        )
        assert info["status"] == "ok"
        assert info["batch"] == 2 and info["image_hw"] == [64, 64]

        def post(arr):
            buf = io.BytesIO()
            np.save(buf, arr, allow_pickle=False)
            req = urllib.request.Request(
                f"{base}/predict", data=buf.getvalue(), method="POST"
            )
            resp = urllib.request.urlopen(req, timeout=300).read()
            return np.load(io.BytesIO(resp), allow_pickle=False)

        rng = np.random.RandomState(0)
        x = rng.randn(2, 64, 64, 3).astype(np.float32)

        # the served module is the local module: compare to rt.call
        from jax import export as jexport
        import orbax.checkpoint as ocp

        fn = jexport.deserialize(
            bytearray((out / "pose_infer.stablehlo").read_bytes())
        )
        variables = ocp.PyTreeCheckpointer().restore(
            str(out / "final_state")
        )
        want = np.asarray(
            fn.call(variables["params"],
                    variables.get("batch_stats", {}), x)
        )
        got = post(x)
        assert got.shape == want.shape == (2, 8, 3)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

        # partial batch pads to the compiled size and slices back
        got1 = post(x[:1])
        assert got1.shape == (1, 8, 3)
        np.testing.assert_allclose(got1, want[:1], rtol=1e-5, atol=1e-5)

        # malformed request -> 400 with a reason, server stays up
        bad = urllib.request.Request(
            f"{base}/predict", data=b"junk", method="POST"
        )
        try:
            urllib.request.urlopen(bad, timeout=60)
            raise AssertionError("expected HTTP 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400
        assert json.loads(
            urllib.request.urlopen(f"{base}/healthz", timeout=60).read()
        )["status"] == "ok"
    finally:
        proc.terminate()
        proc.wait(timeout=30)
