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
