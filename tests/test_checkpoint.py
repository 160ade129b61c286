"""Checkpoint round-trips: save/restore/auto-resume, best tracking, final
export, and the torch fine-tune load path."""

import numpy as np
import jax
import jax.numpy as jnp
import torch

from advmix_tpu.config import load_config
from advmix_tpu.engine import optim, state as state_lib
from advmix_tpu.engine.checkpoint import (
    CheckpointManager,
    export_final_state,
    load_torch_checkpoint,
)
from advmix_tpu.models.pose_resnet import PoseResNet


def _state():
    cfg = load_config()
    model = PoseResNet(num_layers=18, num_joints=4,
                       num_deconv_filters=(16, 16, 16))
    tx = optim.get_optimizer(cfg)
    st = state_lib.create_pose_state(
        model, tx, jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3))
    )
    return st


def test_save_restore_roundtrip(tmp_path):
    st = _state()
    mgr = CheckpointManager(str(tmp_path))
    mgr.save(epoch=3, state=jax.device_get(st), perf=0.71, is_best=True)
    mgr.save(epoch=4, state=jax.device_get(st), perf=0.65, is_best=False)

    assert mgr.latest_epoch() == 4
    restored = mgr.restore(item=st)
    assert int(restored["epoch"]) == 4
    assert float(restored["perf"]) == 0.65
    for a, b in zip(jax.tree.leaves(restored["state"].params
                                    if hasattr(restored["state"], "params")
                                    else restored["state"]["params"]),
                    jax.tree.leaves(st.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_final_export(tmp_path):
    """final_state stores the FULL variables dict (params + batch_stats)
    and load_final_state round-trips it; legacy bare-params payloads are
    still readable."""
    from advmix_tpu.engine.checkpoint import load_final_state

    st = _state()
    variables = jax.device_get(
        {"params": st.params, "batch_stats": st.batch_stats}
    )
    path = export_final_state(str(tmp_path), variables)
    loaded = load_final_state(path, {"params": {}, "batch_stats": {}})
    for a, b in zip(jax.tree.leaves(loaded["params"]),
                    jax.tree.leaves(st.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(loaded["batch_stats"]),
                    jax.tree.leaves(st.batch_stats)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # bare-params export must be rejected (silent BN-stat loss otherwise)
    import pytest

    with pytest.raises(ValueError):
        export_final_state(str(tmp_path), jax.device_get(st.params),
                           name="bad_state")

    # legacy bare-params dirs still load, falling back to init stats
    import orbax.checkpoint as ocp

    legacy = str(tmp_path / "legacy_state")
    ocp.PyTreeCheckpointer().save(legacy, jax.device_get(st.params),
                                  force=True)
    out = load_final_state(
        legacy, {"params": {}, "batch_stats": jax.device_get(st.batch_stats)}
    )
    for a, b in zip(jax.tree.leaves(out["params"]),
                    jax.tree.leaves(st.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_torch_finetune_load(tmp_path):
    """The reference loads 'module.'-prefixed pose checkpoints with
    shape-filtered intersection (tools/train.py:198-235)."""
    import torch.nn as tnn

    t = tnn.Sequential()
    t.add_module("conv1", tnn.Conv2d(3, 64, 7, 2, 3, bias=False))
    t.add_module("bn1", tnn.BatchNorm2d(64))
    sd = {f"module.{k}": v for k, v in t.state_dict().items()}
    # add a shape-mismatched entry that must be skipped
    sd["module.final_layer.weight"] = torch.randn(99, 1, 1, 1)
    pth = str(tmp_path / "ckpt.pth")
    torch.save(sd, pth)

    model = PoseResNet(num_layers=18, num_joints=4,
                       num_deconv_filters=(16, 16, 16))
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)),
                   train=False)
    loaded = load_torch_checkpoint(pth, dict(v))
    np.testing.assert_allclose(
        np.asarray(loaded["params"]["conv1"]["kernel"]),
        t.conv1.weight.detach().numpy().transpose(2, 3, 1, 0),
        atol=1e-6,
    )
    # untouched entries stay at init
    np.testing.assert_array_equal(
        np.asarray(loaded["params"]["final_layer"]["bias"]),
        np.asarray(v["params"]["final_layer"]["bias"]),
    )


def test_async_checkpoint_save(tmp_path):
    """Async saves (the default) overlap IO with training: LATEST is only
    published at the next barrier, after the payload has committed, and
    restore sees the full state."""
    st = _state()
    mgr = CheckpointManager(str(tmp_path))
    assert mgr._async is not None  # async is the default
    mgr.save(epoch=1, state=jax.device_get(st), perf=0.5, is_best=False)
    mgr.wait()
    assert mgr.latest_epoch() == 1
    mgr.save(epoch=2, state=jax.device_get(st), perf=0.6, is_best=True)
    restored = mgr.restore(item=st)  # barriers internally
    assert int(restored["epoch"]) == 2
    for a, b in zip(jax.tree.leaves(restored["state"].params
                                    if hasattr(restored["state"], "params")
                                    else restored["state"]["params"]),
                    jax.tree.leaves(st.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # best snapshot exists (synchronous path)
    import os

    assert os.path.isdir(str(tmp_path / "checkpoint" / "best"))
