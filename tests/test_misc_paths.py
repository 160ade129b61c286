"""Smaller feature paths: ConcatDataset/stylize, OHKM wiring, soft-argmax
eval, profiling utils, config YAML round trip."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from advmix_tpu.config import load_config, get_default_config
from advmix_tpu.data import SyntheticPoseDataset, ConcatDataset
from advmix_tpu.engine import optim, state as state_lib, steps
from advmix_tpu.models.pose_resnet import PoseResNet
from advmix_tpu.ops.heatmap import generate_target, soft_argmax
from advmix_tpu.parallel import get_mesh, device_put_batch
from advmix_tpu.parallel.mesh import replicate


def _cfg(**kw):
    cfg = load_config()
    cfg.defrost()
    cfg.MODEL.NUM_JOINTS = 4
    cfg.MODEL.IMAGE_SIZE = [64, 64]
    cfg.MODEL.HEATMAP_SIZE = [16, 16]
    for k, v in kw.items():
        node = cfg
        parts = k.split(".")
        for p in parts[:-1]:
            node = node[p]
        node[parts[-1]] = v
    cfg.freeze()
    return cfg


def test_concat_dataset():
    cfg = _cfg()
    cfg.defrost()
    cfg.DATASET.DATASET = "synthetic"
    cfg.freeze()
    a = SyntheticPoseDataset(cfg, is_train=True, length=10, num_joints=4)
    b = SyntheticPoseDataset(cfg, is_train=True, length=6, num_joints=4, seed=1)
    c = ConcatDataset([a, b])
    assert len(c) == 16
    rng = np.random.RandomState(0)
    s_last = c.get_sample(15, rng)
    s_b = b.get_sample(5, np.random.RandomState(0))
    np.testing.assert_array_equal(s_last["image"], s_b["image"])


def test_ohkm_loss_wiring():
    """LOSS.USE_OHKM routes the train step through the OHKM loss."""
    cfg = _cfg(**{"LOSS.USE_OHKM": True, "LOSS.TOPK": 2})
    mesh = get_mesh(8)
    model = PoseResNet(num_layers=18, num_joints=4,
                       num_deconv_filters=(16, 16, 16))
    tx = optim.get_optimizer(cfg)
    st = state_lib.create_pose_state(
        model, tx, jax.random.PRNGKey(0), jnp.zeros((2, 64, 64, 3))
    )
    st = replicate(st, mesh)
    step = steps.make_train_step(model, tx, cfg, mesh)
    rng = np.random.RandomState(0)
    joints = rng.uniform(5, 59, (8, 4, 2)).astype(np.float32)
    tgt, _, w = generate_target(
        jnp.asarray(joints), jnp.ones((8, 4)), (64, 64), (16, 16), 2
    )
    batch = device_put_batch(
        {"image": jnp.asarray(rng.randn(8, 64, 64, 3).astype(np.float32)),
         "target": tgt, "target_weight": w},
        mesh,
    )
    losses = []
    for _ in range(3):
        st, m = step(st, batch)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]


def test_soft_argmax_eval_path():
    cfg = _cfg(**{"TEST.SOFT_ARGMAX": True, "TEST.POST_PROCESS": False})
    mesh = get_mesh(8)
    model = PoseResNet(num_layers=18, num_joints=4,
                       num_deconv_filters=(16, 16, 16))
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((2, 64, 64, 3)),
                   train=False)
    step = steps.make_eval_step(model, cfg, [[0, 1]], mesh)
    rng = np.random.RandomState(0)
    joints = rng.uniform(5, 59, (8, 4, 2)).astype(np.float32)
    tgt, _, w = generate_target(
        jnp.asarray(joints), jnp.ones((8, 4)), (64, 64), (16, 16), 2
    )
    batch = device_put_batch(
        {"image": jnp.asarray(rng.randn(8, 64, 64, 3).astype(np.float32)),
         "target": tgt, "target_weight": w,
         "center": jnp.asarray(rng.uniform(100, 200, (8, 2)).astype(np.float32)),
         "scale": jnp.asarray(rng.uniform(0.9, 1.2, (8, 2)).astype(np.float32))},
        mesh,
    )
    preds, maxvals, metrics = step(
        replicate(v["params"], mesh), replicate(v["batch_stats"], mesh), batch
    )
    assert preds.shape == (8, 4, 2)
    assert np.isfinite(np.asarray(preds)).all()


def test_soft_argmax_sharp_peak():
    hm = np.zeros((1, 16, 16, 1), np.float32)
    hm[0, 5, 7, 0] = 30.0  # sharp, high-beta expectation ~ argmax
    coords, maxvals = soft_argmax(jnp.asarray(hm), beta=160.0)
    np.testing.assert_allclose(np.asarray(coords[0, 0]), [7.0, 5.0], atol=0.05)
    assert float(maxvals[0, 0, 0]) == pytest.approx(30.0)


def test_step_timer_and_trace(tmp_path):
    from advmix_tpu.utils.profiling import StepTimer, trace

    t = StepTimer(warmup=1)
    x = jnp.ones((8, 8))
    with trace(str(tmp_path), enabled=False):
        for _ in range(3):
            y = x * 2
            t.tick(8, sync=y)
    assert t.img_per_sec > 0


def test_config_yaml_roundtrip(tmp_path):
    cfg = get_default_config()
    d = cfg.to_dict()
    import yaml

    p = tmp_path / "cfg.yaml"
    with open(p, "w") as f:
        yaml.safe_dump({"MODEL": {"SIGMA": 3}, "TRAIN": {"LR": 0.01}}, f)
    cfg.merge_from_file(str(p))
    assert cfg.MODEL.SIGMA == 3
    assert cfg.TRAIN.LR == 0.01
    # GPUS stays a tuple through list merges (yacs-compat coercion)
    cfg.merge_from_dict({"GPUS": [0, 1, 2]})
    assert cfg.GPUS == (0, 1, 2)


def test_synthetic_dataset_pck_evaluate():
    """SyntheticPoseDataset.evaluate is a real PCK@0.1 (robustness-demo
    metric): exact GT predictions score 1.0, far-off ones 0.0, and
    SYNTH_LENGTH sizes the dataset."""
    import numpy as np

    from advmix_tpu.config import get_default_config
    from advmix_tpu.data.datasets import SyntheticPoseDataset

    cfg = get_default_config()
    cfg.defrost()
    cfg.MODEL.IMAGE_SIZE = [64, 64]
    cfg.MODEL.HEATMAP_SIZE = [16, 16]
    cfg.MODEL.NUM_JOINTS = 8
    cfg.DATASET.DATASET = "synthetic"
    cfg.DATASET.SYNTH_LENGTH = 12
    cfg.freeze()
    from advmix_tpu.data import build_dataset

    ds = build_dataset(cfg, is_train=False)
    assert len(ds) == 12

    preds = np.zeros((12, 8, 3), np.float32)
    for i, r in enumerate(ds.records):
        preds[i, :, :2] = r["joints_3d"][:, :2]
    nv, perf = ds.evaluate(cfg, preds, "/tmp")
    assert perf == 1.0 and nv["PCK"] == 1.0

    nv, perf = ds.evaluate(cfg, preds + 1000.0, "/tmp")
    assert perf == 0.0


def test_profile_kernel_analysis_math(tmp_path):
    """tools/profile.py analyze_kernels: per-kernel aggregation over
    steps, model_flops parsing, and the max(bytes-bound, flops-bound)
    speed-of-light, on a synthetic trace file."""
    import gzip
    import json
    import os

    import importlib.util

    # load by path: the module name "profile" collides with stdlib
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, os.path.join(repo, "tools"))  # for its _parse import
    spec = importlib.util.spec_from_file_location(
        "advmix_profile_cli", os.path.join(repo, "tools", "profile.py"))
    profile_mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(profile_mod)
    d = tmp_path / "plugins" / "profile" / "run1"
    d.mkdir(parents=True)
    events = []
    # kernel A: 2 calls/step x 2 steps, 1 GB + 1 GFLOP per call
    for _ in range(4):
        events.append({
            "ph": "X", "name": "fusion.A", "dur": 500.0,
            "args": {"hlo_category": "convolution fusion",
                     "bytes_accessed": str(10**9),
                     "model_flops": str(10**9)}})
    # kernel B: flops-bound (tiny bytes, huge flops)
    events.append({
        "ph": "X", "name": "fusion.B", "dur": 2000.0,
        "args": {"hlo_category": "loop fusion",
                 "bytes_accessed": "1000",
                 "model_flops": str(4 * 10**12)}})
    with gzip.open(d / "x.trace.json.gz", "wt") as f:
        json.dump({"traceEvents": events}, f)

    rows = profile_mod.analyze_kernels(str(tmp_path), n_steps=2,
                                       peak_gbs=500.0, peak_tflops=200.0)
    by = {r[0]: r for r in rows}
    _, t_ms, gb, gfl, sol, cnt = by["fusion.A"]
    assert abs(t_ms - 1.0) < 1e-6          # 2 calls/step x 500us
    assert abs(gb - 2.0) < 1e-6 and abs(gfl - 2.0) < 1e-6
    assert abs(sol - 2.0 / 500.0 * 1e3) < 1e-6  # bytes-bound: 2GB/500GB/s
    assert cnt == 2
    _, _, _, gfl_b, sol_b, _ = by["fusion.B"]
    assert abs(gfl_b - 2000.0) < 1e-6
    assert abs(sol_b - 10.0) < 1e-6        # 2 TFLOP / 200 TFLOP/s = 10 ms
