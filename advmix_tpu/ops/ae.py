"""Associative-embedding ops for bottom-up pose (HigherHRNet).

The reference publishes bottom-up AdvMix numbers but ships no bottom-up
code (SURVEY §6 gap); these follow the public spec (Newell et al.'s
associative embedding with the 'exp' push loss, as used by HigherHRNet):

- ae_loss: per-person reference tag = mean of tagmap values at GT keypoint
  locations; pull = squared deviation of joint tags from the person tag;
  push = exp(-(h_n - h_m)^2) over person pairs.
- bottom-up multi-person Gaussian heatmap targets (max over persons).
- top-k peak extraction with max-pool NMS (device side); the sequential
  greedy tag grouping lives in evaluation/grouping.py (host).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# targets
# ---------------------------------------------------------------------------

def generate_bottomup_target(
    joints: jnp.ndarray,  # (B, M, J, 2) coords in heatmap space
    joints_vis: jnp.ndarray,  # (B, M, J)
    heatmap_size,  # (w, h)
    sigma: float,
):
    """Multi-person Gaussian heatmaps: per joint, max over persons.

    Same quantize-then-paste window semantics as the top-down generator
    (ops/heatmap.py), applied per person then max-combined.
    Returns (B, Hh, Hw, J) heatmaps and quantized int locations (B, M, J, 2).
    """
    hw, hh = int(heatmap_size[0]), int(heatmap_size[1])
    tmp_size = int(sigma * 3)
    mu_x = jnp.trunc(joints[..., 0] + 0.5).astype(jnp.int32)  # (B, M, J)
    mu_y = jnp.trunc(joints[..., 1] + 0.5).astype(jnp.int32)

    in_bounds = (
        (mu_x - tmp_size < hw) & (mu_y - tmp_size < hh)
        & (mu_x + tmp_size + 1 >= 0) & (mu_y + tmp_size + 1 >= 0)
    )
    paste = (joints_vis > 0.5) & in_bounds  # (B, M, J)

    xs = jnp.arange(hw, dtype=jnp.int32)
    ys = jnp.arange(hh, dtype=jnp.int32)
    dx = xs[None, None, None, :] - mu_x[..., None]  # (B, M, J, Hw)
    dy = ys[None, None, None, :] - mu_y[..., None]  # (B, M, J, Hh)
    gx = jnp.exp(-(dx.astype(jnp.float32) ** 2) / (2.0 * sigma**2))
    gy = jnp.exp(-(dy.astype(jnp.float32) ** 2) / (2.0 * sigma**2))
    gx = jnp.where(jnp.abs(dx) <= tmp_size, gx, 0.0)
    gy = jnp.where(jnp.abs(dy) <= tmp_size, gy, 0.0)
    g = gy[..., :, None] * gx[..., None, :]  # (B, M, J, Hh, Hw)
    g = g * paste[..., None, None]
    target = jnp.max(g, axis=1)  # max over persons -> (B, J, Hh, Hw)
    target = jnp.transpose(target, (0, 2, 3, 1))
    locs = jnp.stack([mu_x, mu_y], axis=-1) * paste[..., None]
    return target, locs


# ---------------------------------------------------------------------------
# AE loss
# ---------------------------------------------------------------------------

def ae_loss(
    tags: jnp.ndarray,  # (B, H, W, J) tagmaps (tag_per_joint)
    joint_locs: jnp.ndarray,  # (B, M, J, 2) int locations in tagmap space
    joints_vis: jnp.ndarray,  # (B, M, J) 0/1
):
    """Returns (pull, push), each a scalar mean over the batch."""
    b, h, w, j = tags.shape
    m = joint_locs.shape[1]
    x = jnp.clip(joint_locs[..., 0], 0, w - 1)
    y = jnp.clip(joint_locs[..., 1], 0, h - 1)

    flat = tags.transpose(0, 3, 1, 2).reshape(b, j, h * w)  # (B, J, HW)
    idx = (y * w + x).transpose(0, 2, 1)  # (B, J, M)
    t = jnp.take_along_axis(flat, idx, axis=2)  # (B, J, M)
    t = t.transpose(0, 2, 1)  # (B, M, J)

    vis = joints_vis.astype(jnp.float32)
    n_vis = jnp.sum(vis, axis=2)  # (B, M)
    person_valid = n_vis > 0
    href = jnp.sum(t * vis, axis=2) / jnp.maximum(n_vis, 1.0)  # (B, M)

    # pull
    dev = (t - href[:, :, None]) ** 2 * vis
    per_person = jnp.sum(dev, axis=2) / jnp.maximum(n_vis, 1.0)
    k = jnp.sum(person_valid, axis=1)  # (B,)
    pull = jnp.sum(per_person * person_valid, axis=1) / jnp.maximum(k, 1.0)

    # push (exp type): sum over ordered pairs n != m of exp(-(hn-hm)^2)
    pv = person_valid.astype(jnp.float32)
    pair_valid = pv[:, :, None] * pv[:, None, :]
    eye = jnp.eye(m)[None]
    diff = href[:, :, None] - href[:, None, :]
    e = jnp.exp(-(diff**2)) * pair_valid * (1.0 - eye)
    denom = jnp.maximum(k * (k - 1), 1.0)
    push = jnp.sum(e, axis=(1, 2)) / denom * 0.5
    push = jnp.where(k > 1, push, 0.0)

    return jnp.mean(pull), jnp.mean(push)


def bottomup_heatmap_loss(pred, target, mask=None):
    """Per-pixel MSE with an optional ignore mask (B, H, W)."""
    d = (pred - target) ** 2
    if mask is not None:
        d = d * mask[..., None]
    return jnp.mean(d)


# ---------------------------------------------------------------------------
# peak extraction (device)
# ---------------------------------------------------------------------------

def top_k_peaks(heatmaps: jnp.ndarray, tags: jnp.ndarray, k: int = 30):
    """Max-pool NMS then per-joint top-k.

    heatmaps: (B, H, W, J); tags: (B, H, W, J) scalar tagmaps or
    (B, H, W, J, T) stacked tag vectors (flip-test concatenates the
    unflipped and flipped-back tagmaps as T=2 — the published HigherHRNet
    flip protocol; grouping distance is the L2 norm over T).
    Returns dict of (B, J, k) arrays: x, y, val; tag is (B, J, k) or
    (B, J, k, T) matching the input.
    """
    b, h, w, j = heatmaps.shape
    pooled = jax.lax.reduce_window(
        heatmaps, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 1, 1, 1),
        "SAME",
    )
    keep = jnp.where(pooled == heatmaps, heatmaps, 0.0)
    flat = keep.transpose(0, 3, 1, 2).reshape(b, j, h * w)
    vals, idx = jax.lax.top_k(flat, k)  # (B, J, k)
    xs = (idx % w).astype(jnp.float32)
    ys = (idx // w).astype(jnp.float32)
    if tags.ndim == 5:
        t = tags.shape[-1]
        tflat = tags.transpose(0, 3, 4, 1, 2).reshape(b, j, t, h * w)
        tvals = jnp.take_along_axis(tflat, idx[:, :, None, :], axis=3)
        tvals = tvals.transpose(0, 1, 3, 2)  # (B, J, k, T)
    else:
        tflat = tags.transpose(0, 3, 1, 2).reshape(b, j, h * w)
        tvals = jnp.take_along_axis(tflat, idx, axis=2)
    return {"x": xs, "y": ys, "val": vals, "tag": tvals}


def aggregate_heatmaps(outputs, target_hw):
    """Average multi-scale heatmaps at a common resolution (bilinear),
    and upsample the tagmap. outputs: list of NHWC maps where outputs[0]
    carries J heatmaps + J tags and outputs[1:] carry J heatmaps."""
    th, tw = target_hw
    num_j = outputs[-1].shape[-1]
    heat = []
    for o in outputs:
        hm = o[..., :num_j]
        b, h, w, _ = hm.shape
        heat.append(
            jax.image.resize(hm, (b, th, tw, num_j), method="linear")
        )
    heat_avg = sum(heat) / len(heat)
    tags = outputs[0][..., num_j:]
    b = tags.shape[0]
    tags_up = jax.image.resize(
        tags, (b, th, tw, tags.shape[-1]), method="linear"
    )
    return heat_avg, tags_up
