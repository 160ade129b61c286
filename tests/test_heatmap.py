"""Tests for heatmap target generation, decoding, PCK, and losses against
numpy oracles and the reference's documented semantics."""

import numpy as np
import jax.numpy as jnp
import torch

from advmix_tpu.ops import heatmap as H
from advmix_tpu.ops import losses as L

IMG = (192, 256)  # (w, h)
HM = (48, 64)
SIGMA = 2


def _rand_joints(rng, b, j):
    joints = rng.uniform(-30, 230, size=(b, j, 2)).astype(np.float32)
    vis = (rng.uniform(size=(b, j)) > 0.3).astype(np.float32)
    return joints, vis


def test_generate_target_matches_oracle():
    rng = np.random.RandomState(42)
    joints, vis = _rand_joints(rng, 6, 17)
    tgt, centers, w = H.generate_target(
        jnp.asarray(joints), jnp.asarray(vis), IMG, HM, SIGMA
    )
    for i in range(6):
        t_np, c_np, w_np = H.generate_target_np(joints[i], vis[i], IMG, HM, SIGMA)
        np.testing.assert_allclose(np.asarray(tgt[i]), t_np, atol=1e-5)
        np.testing.assert_allclose(np.asarray(centers[i]), c_np, atol=1e-5)
        np.testing.assert_allclose(np.asarray(w[i]), w_np, atol=1e-5)


def test_generate_target_center_is_one():
    joints = np.array([[[96.0, 128.0]]], np.float32)  # center of image
    vis = np.ones((1, 1), np.float32)
    tgt, centers, w = H.generate_target(
        jnp.asarray(joints), jnp.asarray(vis), IMG, HM, SIGMA
    )
    mu = np.asarray(centers[0, 0]).astype(int)
    assert np.asarray(tgt)[0, mu[1], mu[0], 0] == 1.0
    assert np.asarray(w)[0, 0] == 1.0


def test_get_max_preds():
    hm = np.zeros((2, 8, 6, 3), np.float32)
    hm[0, 3, 4, 0] = 1.0
    hm[0, 7, 1, 1] = 0.5
    # joint 2 all zeros -> masked to 0
    hm[1, 0, 0, 0] = 0.7
    preds, maxvals = H.get_max_preds(jnp.asarray(hm))
    preds = np.asarray(preds)
    np.testing.assert_allclose(preds[0, 0], [4, 3])
    np.testing.assert_allclose(preds[0, 1], [1, 7])
    np.testing.assert_allclose(preds[0, 2], [0, 0])
    assert np.asarray(maxvals)[0, 0, 0] == 1.0


def test_quarter_offset_direction():
    hm = np.zeros((1, 16, 16, 1), np.float32)
    hm[0, 8, 8, 0] = 1.0
    hm[0, 8, 9, 0] = 0.6  # larger right neighbor -> +0.25 in x
    hm[0, 7, 8, 0] = 0.6  # larger top neighbor -> -0.25 in y
    coords, _ = H.get_max_preds(jnp.asarray(hm))
    out = np.asarray(H.quarter_offset(jnp.asarray(hm), coords))
    np.testing.assert_allclose(out[0, 0], [8.25, 7.75])


def test_quarter_offset_skips_border():
    hm = np.zeros((1, 16, 16, 1), np.float32)
    hm[0, 1, 1, 0] = 1.0  # px=1 not strictly > 1 -> untouched
    coords, _ = H.get_max_preds(jnp.asarray(hm))
    out = np.asarray(H.quarter_offset(jnp.asarray(hm), coords))
    np.testing.assert_allclose(out[0, 0], [1.0, 1.0])


def test_pck_accuracy_perfect_and_miss():
    rng = np.random.RandomState(0)
    joints, vis = _rand_joints(rng, 4, 17)
    tgt, _, _ = H.generate_target(jnp.asarray(joints), jnp.asarray(vis), IMG, HM, SIGMA)
    per, avg, cnt = H.pck_accuracy(tgt, tgt)
    assert float(avg) == 1.0
    # shifted predictions far away -> accuracy 0 for valid joints
    shifted = jnp.roll(tgt, 20, axis=2)
    per2, avg2, _ = H.pck_accuracy(shifted, tgt)
    assert float(avg2) < 0.5


def _torch_joints_loss(out, tgt, w, use_w=True, crit="smooth_l1"):
    """Reference numerics via torch (per-joint 0.5*criterion / J)."""
    criterion = torch.nn.SmoothL1Loss() if crit == "smooth_l1" else torch.nn.MSELoss()
    out_t = torch.tensor(np.transpose(out, (0, 3, 1, 2)))
    tgt_t = torch.tensor(np.transpose(tgt, (0, 3, 1, 2)))
    w_t = torch.tensor(w)[:, :, None]
    b, j = out_t.shape[0], out_t.shape[1]
    hp = out_t.reshape(b, j, -1).split(1, 1)
    hg = tgt_t.reshape(b, j, -1).split(1, 1)
    loss = 0
    for idx in range(j):
        p = hp[idx].squeeze()
        g = hg[idx].squeeze()
        if use_w:
            loss += 0.5 * criterion(p.mul(w_t[:, idx]), g.mul(w_t[:, idx]))
        else:
            loss += 0.5 * criterion(p, g)
    return float(loss / j)


def test_joints_loss_matches_torch():
    rng = np.random.RandomState(1)
    out = rng.randn(3, 16, 12, 5).astype(np.float32)
    tgt = rng.randn(3, 16, 12, 5).astype(np.float32)
    w = (rng.uniform(size=(3, 5)) > 0.3).astype(np.float32)
    for crit in ["smooth_l1", "mse"]:
        ours = float(
            L.joints_loss(jnp.asarray(out), jnp.asarray(tgt), jnp.asarray(w),
                          use_target_weight=True, criterion=crit)
        )
        ref = _torch_joints_loss(out, tgt, w, True, crit)
        np.testing.assert_allclose(ours, ref, rtol=1e-5)
    ours_nw = float(
        L.joints_loss(jnp.asarray(out), jnp.asarray(tgt), jnp.asarray(w),
                      use_target_weight=False)
    )
    np.testing.assert_allclose(ours_nw, _torch_joints_loss(out, tgt, w, False), rtol=1e-5)


def test_ohkm_loss_matches_torch():
    rng = np.random.RandomState(2)
    out = rng.randn(4, 8, 6, 17).astype(np.float32)
    tgt = rng.randn(4, 8, 6, 17).astype(np.float32)
    w = np.ones((4, 17), np.float32)
    ours = float(
        L.joints_ohkm_loss(jnp.asarray(out), jnp.asarray(tgt), jnp.asarray(w), topk=8)
    )
    # torch oracle per lib/core/loss.py:68-110
    out_t = torch.tensor(np.transpose(out, (0, 3, 1, 2)))
    tgt_t = torch.tensor(np.transpose(tgt, (0, 3, 1, 2)))
    w_t = torch.tensor(w)[:, :, None]
    crit = torch.nn.MSELoss(reduction="none")
    b, j = 4, 17
    hp = out_t.reshape(b, j, -1).split(1, 1)
    hg = tgt_t.reshape(b, j, -1).split(1, 1)
    losses = []
    for idx in range(j):
        p = hp[idx].squeeze()
        g = hg[idx].squeeze()
        losses.append(0.5 * crit(p.mul(w_t[:, idx]), g.mul(w_t[:, idx])))
    losses = [l.mean(dim=1).unsqueeze(1) for l in losses]
    loss_mat = torch.cat(losses, dim=1)
    ohkm = 0.0
    for i in range(b):
        vals, idxs = torch.topk(loss_mat[i], k=8, dim=0, sorted=False)
        ohkm += torch.sum(torch.gather(loss_mat[i], 0, idxs)) / 8
    ref = float(ohkm / b)
    np.testing.assert_allclose(ours, ref, rtol=1e-5)
