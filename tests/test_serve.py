"""tools/serve.py: the export directory is a complete deployable —
serve it over HTTP with no model code and get the same predictions the
module produces locally (incl. the partial-batch padding path)."""

import io
import json
import os
import re
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
            m = re.search(r"serving pose model on http://[^:\s]+:(\d+)", txt)
            if m:
                port = int(m.group(1))
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


TINY_HIGHER = [
    "MODEL.IMAGE_SIZE", "[64,64]", "MODEL.HEATMAP_SIZE", "[16,16]",
    "MODEL.EXTRA.STAGE2.NUM_BLOCKS", "[1,1]",
    "MODEL.EXTRA.STAGE3.NUM_BLOCKS", "[1,1,1]",
    "MODEL.EXTRA.STAGE4.NUM_BLOCKS", "[1,1,1,1]",
    "MODEL.EXTRA.STAGE3.NUM_MODULES", "1",
    "MODEL.EXTRA.STAGE4.NUM_MODULES", "1",
    "MODEL.EXTRA.STAGE2.NUM_CHANNELS", "[8,16]",
    "MODEL.EXTRA.STAGE3.NUM_CHANNELS", "[8,16,32]",
    "MODEL.EXTRA.STAGE4.NUM_CHANNELS", "[8,16,32,64]",
    "MODEL.EXTRA.DECONV.NUM_CHANNELS", "[8]",
]


@pytest.mark.slow
def test_serve_bottomup_export_roundtrip(tmp_path):
    """Bottom-up (HigherHRNet) serving: export emits the device half of
    validate_bottomup (aggregated heatmaps + stacked flip tags + top-k
    peaks as named arrays), serve.py answers .npz, and the response feeds
    evaluation.grouping.parse_bottomup directly — the full
    export -> serve -> group chain with no model code on the server."""
    out = tmp_path / "export"
    r = subprocess.run(
        [sys.executable, "tools/export.py",
         "--cfg", "experiments/coco/higher_hrnet/w32_512_advmix.yaml",
         "--batch", "2", "--out", str(out),
         "OUTPUT_DIR", str(tmp_path / "o"), "LOG_DIR", str(tmp_path / "l")]
        + TINY_HIGHER,
        cwd=REPO, env=_env(), capture_output=True, text=True, timeout=1500,
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
            m = re.search(r"serving pose model on http://[^:\s]+:(\d+)", txt)
            if m:
                port = int(m.group(1))
                break
            time.sleep(1.0)
        assert port, f"server never came up:\n{log.read_text()[-2000:]}"
        base = f"http://127.0.0.1:{port}"

        info = json.loads(
            urllib.request.urlopen(f"{base}/healthz", timeout=60).read()
        )
        assert info["outputs"] == sorted(
            ["heat", "tags", "peak_x", "peak_y", "peak_val", "peak_tag"]
        )

        rng = np.random.RandomState(0)
        x = rng.randn(2, 64, 64, 3).astype(np.float32)
        buf = io.BytesIO()
        np.save(buf, x, allow_pickle=False)
        req = urllib.request.Request(
            f"{base}/predict", data=buf.getvalue(), method="POST"
        )
        resp = np.load(
            io.BytesIO(urllib.request.urlopen(req, timeout=300).read())
        )
        # flip-test stacks a second tag dim; aggregation runs at the
        # model's scale-1 output resolution (16x16 hm at 64px input -> the
        # deconv head doubles it to 32)
        heat, tags = resp["heat"], resp["tags"]
        assert heat.shape[0] == 2 and heat.shape[-1] == 17
        assert tags.shape[:3] == heat.shape[:3] and tags.shape[-1] == 2
        assert resp["peak_val"].shape[:2] == (2, 17)
        assert np.isfinite(heat).all()

        # the served arrays ARE parse_bottomup's input contract
        from advmix_tpu.evaluation.grouping import parse_bottomup

        pk = {k: resp[f"peak_{k}"][0] for k in ("x", "y", "val", "tag")}
        people, scores = parse_bottomup(heat[0], tags[0], pk)
        assert people.shape[0] == len(scores)
    finally:
        proc.terminate()
        proc.wait(timeout=30)


@pytest.mark.slow
def test_export_bottomup_batch_polymorphic(tmp_path):
    """--batch 0 (shape-polymorphic StableHLO) for the bottom-up family,
    with multi-scale TEST.SCALE_FACTOR — the combination ADVICE r4 flagged
    as unverified (top_k_peaks' reshape and jax.image.resize must accept a
    symbolic leading dim). The export CLI itself round-trips the
    serialized module at batch 4 and batch 7; rc=0 + the banner is the
    assertion."""
    out = tmp_path / "export"
    r = subprocess.run(
        [sys.executable, "tools/export.py",
         "--cfg", "experiments/coco/higher_hrnet/w32_512_advmix.yaml",
         "--batch", "0", "--out", str(out),
         "TEST.SCALE_FACTOR", "[0.5,1,2]",
         "OUTPUT_DIR", str(tmp_path / "o"), "LOG_DIR", str(tmp_path / "l")]
        + TINY_HIGHER,
        cwd=REPO, env=_env(), capture_output=True, text=True, timeout=1500,
    )
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    assert (out / "pose_infer.stablehlo").exists()
    combined = r.stdout + r.stderr
    assert "polymorphic round-trip OK at batch 7" in combined, combined[-2000:]
