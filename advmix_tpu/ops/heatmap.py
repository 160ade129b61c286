"""Heatmap target generation, decoding, and train-time PCK accuracy —
batched, on-device, NHWC.

Behavioral references:
- target generation: AdvMix `lib/dataset/JointsDataset.py:412-491`
  (stride-quantized joint location, unnormalized Gaussian pasted on a
  (6*sigma+1)^2 window, weight zeroed when the window is fully out of
  bounds). The quantize-then-paste semantics — including the `int(x + 0.5)`
  truncation — are reproduced exactly, but as one vectorized masked
  expression over the full grid instead of a per-joint numpy paste.
- decoding: `lib/core/inference.py:22-95` (argmax + optional quarter-pixel
  offset toward the larger neighbor, then inverse-affine back-projection).
- PCK: `lib/core/evaluate.py:16-99` (including the [h, w]/10 normalization
  order quirk).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from .transforms import transform_preds_jax


# ---------------------------------------------------------------------------
# Target generation
# ---------------------------------------------------------------------------

def generate_target(
    joints: jnp.ndarray,  # (B, J, 2) joint coords in image space
    joints_vis: jnp.ndarray,  # (B, J) visibility (0/1)
    image_size,  # (w, h) static
    heatmap_size,  # (w, h) static
    sigma: float,
):
    """Batched Gaussian heatmap targets.

    Returns:
      target: (B, Hh, Hw, J) float32 heatmaps (NHWC)
      target_centers: (B, J, 2) quantized [mu_x, mu_y] (0 where not pasted)
      target_weight: (B, J) float32
    """
    hw, hh = int(heatmap_size[0]), int(heatmap_size[1])
    stride_x = float(image_size[0]) / hw
    stride_y = float(image_size[1]) / hh
    tmp_size = int(sigma * 3)

    # int(x + 0.5) truncates toward zero (Python int()), not floor.
    mu_x = jnp.trunc(joints[..., 0] / stride_x + 0.5).astype(jnp.int32)
    mu_y = jnp.trunc(joints[..., 1] / stride_y + 0.5).astype(jnp.int32)

    ul_x, ul_y = mu_x - tmp_size, mu_y - tmp_size
    br_x, br_y = mu_x + tmp_size + 1, mu_y + tmp_size + 1
    out_of_bounds = (ul_x >= hw) | (ul_y >= hh) | (br_x < 0) | (br_y < 0)

    weight = joints_vis.astype(jnp.float32) * (~out_of_bounds)
    paste = weight > 0.5  # (B, J)

    xs = jnp.arange(hw, dtype=jnp.int32)
    ys = jnp.arange(hh, dtype=jnp.int32)
    dx = xs[None, None, :] - mu_x[..., None]  # (B, J, Hw)
    dy = ys[None, None, :] - mu_y[..., None]  # (B, J, Hh)

    gx = jnp.exp(-(dx.astype(jnp.float32) ** 2) / (2.0 * sigma**2))
    gy = jnp.exp(-(dy.astype(jnp.float32) ** 2) / (2.0 * sigma**2))
    # Hard window: the reference pastes only a (2*tmp_size+1)^2 patch.
    gx = jnp.where(jnp.abs(dx) <= tmp_size, gx, 0.0)
    gy = jnp.where(jnp.abs(dy) <= tmp_size, gy, 0.0)

    # (B, J, Hh, Hw) separable outer product, masked by paste flag
    g = gy[:, :, :, None] * gx[:, :, None, :]
    g = g * paste[:, :, None, None]
    target = jnp.transpose(g, (0, 2, 3, 1))  # NHWC

    centers = jnp.stack(
        [mu_x.astype(jnp.float32), mu_y.astype(jnp.float32)], axis=-1
    )
    centers = centers * paste[..., None]
    return target, centers, weight


def generate_target_np(joints, joints_vis, image_size, heatmap_size, sigma):
    """Numpy oracle with the reference's literal paste-loop semantics.

    Used by tests and by the host-side (CPU) data path; returns the same
    layout as `generate_target` for a single sample: (Hh, Hw, J), (J, 2),
    (J,).
    """
    num_joints = joints.shape[0]
    hw, hh = int(heatmap_size[0]), int(heatmap_size[1])
    target = np.zeros((num_joints, hh, hw), dtype=np.float32)
    centers = np.zeros((num_joints, 2), dtype=np.float32)
    weight = np.asarray(joints_vis, dtype=np.float32).copy()
    tmp_size = sigma * 3
    stride = np.array(
        [image_size[0] / hw, image_size[1] / hh], dtype=np.float64
    )

    for j in range(num_joints):
        mu_x = int(joints[j][0] / stride[0] + 0.5)
        mu_y = int(joints[j][1] / stride[1] + 0.5)
        ul = [int(mu_x - tmp_size), int(mu_y - tmp_size)]
        br = [int(mu_x + tmp_size + 1), int(mu_y + tmp_size + 1)]
        if ul[0] >= hw or ul[1] >= hh or br[0] < 0 or br[1] < 0:
            weight[j] = 0
            continue
        size = 2 * tmp_size + 1
        x = np.arange(0, size, 1, np.float32)
        y = x[:, np.newaxis]
        x0 = y0 = size // 2
        g = np.exp(-((x - x0) ** 2 + (y - y0) ** 2) / (2 * sigma**2))
        g_x = max(0, -ul[0]), min(br[0], hw) - ul[0]
        g_y = max(0, -ul[1]), min(br[1], hh) - ul[1]
        img_x = max(0, ul[0]), min(br[0], hw)
        img_y = max(0, ul[1]), min(br[1], hh)
        if weight[j] > 0.5:
            target[j][img_y[0] : img_y[1], img_x[0] : img_x[1]] = g[
                g_y[0] : g_y[1], g_x[0] : g_x[1]
            ]
            centers[j] = [mu_x, mu_y]
    return np.transpose(target, (1, 2, 0)), centers, weight


# ---------------------------------------------------------------------------
# Decoding
# ---------------------------------------------------------------------------

def get_max_preds(heatmaps: jnp.ndarray):
    """Argmax decode on NHWC heatmaps (B, H, W, J).

    Returns preds (B, J, 2) as (x, y) float32 and maxvals (B, J, 1).
    Coordinates are zeroed where maxval <= 0, matching
    `lib/core/inference.py:45-48`.
    """
    b, h, w, j = heatmaps.shape
    flat = heatmaps.transpose(0, 3, 1, 2).reshape(b, j, h * w)
    idx = jnp.argmax(flat, axis=2)
    maxvals = jnp.max(flat, axis=2, keepdims=True)  # (B, J, 1)
    px = (idx % w).astype(jnp.float32)
    py = jnp.floor(idx.astype(jnp.float32) / w)
    preds = jnp.stack([px, py], axis=-1)
    mask = (maxvals > 0.0).astype(jnp.float32)
    return preds * mask, maxvals


def quarter_offset(heatmaps: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """POST_PROCESS quarter-pixel refinement (`lib/core/inference.py:63-76`):
    shift each coord 0.25px toward the larger of its two axis neighbors,
    only when the rounded peak is strictly inside (1, size-2)."""
    b, h, w, j = heatmaps.shape
    hm = heatmaps.transpose(0, 3, 1, 2)  # (B, J, H, W)
    px = jnp.floor(coords[..., 0] + 0.5).astype(jnp.int32)
    py = jnp.floor(coords[..., 1] + 0.5).astype(jnp.int32)
    inside = (px > 1) & (px < w - 1) & (py > 1) & (py < h - 1)
    pxc = jnp.clip(px, 1, w - 2)
    pyc = jnp.clip(py, 1, h - 2)

    flat = hm.reshape(b, j, h * w)

    def at(yy, xx):
        return jnp.take_along_axis(flat, (yy * w + xx)[..., None], axis=2)[..., 0]

    diff_x = at(pyc, pxc + 1) - at(pyc, pxc - 1)
    diff_y = at(pyc + 1, pxc) - at(pyc - 1, pxc)
    delta = jnp.stack([jnp.sign(diff_x), jnp.sign(diff_y)], axis=-1) * 0.25
    return coords + delta * inside[..., None].astype(coords.dtype)


def get_final_preds(
    heatmaps: jnp.ndarray,  # (B, H, W, J)
    center: jnp.ndarray,  # (B, 2)
    scale: jnp.ndarray,  # (B, 2)
    post_process: bool = True,
):
    """Full decode: argmax (+ quarter offset) then inverse-affine to original
    image coords. Device-side equivalent of `lib/core/inference.py:52-95`.

    Returns preds (B, J, 2) and maxvals (B, J, 1)."""
    coords, maxvals = get_max_preds(heatmaps)
    if post_process:
        coords = quarter_offset(heatmaps, coords)
    h, w = heatmaps.shape[1], heatmaps.shape[2]
    preds = transform_preds_jax(coords, center, scale, (w, h))
    return preds, maxvals


# ---------------------------------------------------------------------------
# Train-time PCK accuracy (on-device)
# ---------------------------------------------------------------------------

def pck_accuracy(output: jnp.ndarray, target: jnp.ndarray, thr: float = 0.5,
                 sample_mask: jnp.ndarray | None = None):
    """PCK on argmax-decoded heatmap coords, NHWC inputs (B, H, W, J).

    Matches `lib/core/evaluate.py:41-99`: distances normalized by
    np.array([h, w]) / 10 (reference quirk: h scales x, w scales y),
    samples with target coords <= 1 ignored.

    sample_mask (B,) optionally excludes rows (the Loader's padded tail
    repeats of the last sample) from the statistics entirely.

    Returns (per_joint_acc (J,), avg_acc scalar, cnt scalar).
    Per-joint accuracies are -1 where no valid sample exists."""
    hit_j, valid_j = pck_sums(output, target, thr, sample_mask)
    return pck_from_sums(hit_j, valid_j)


def pck_sums(output: jnp.ndarray, target: jnp.ndarray, thr: float = 0.5,
             sample_mask: jnp.ndarray | None = None):
    """Per-joint (hit_count, valid_count) sums for PCK — the psum-able
    half of `pck_accuracy`. Sharded eval steps reduce these across the
    data axis before `pck_from_sums` so the logged PCK is the exact
    global statistic, independent of how samples (and padded tail rows)
    distribute over replicas."""
    pred, _ = get_max_preds(output)
    tgt, _ = get_max_preds(target)
    h, w = output.shape[1], output.shape[2]
    norm = jnp.array([h / 10.0, w / 10.0], jnp.float32)

    valid = (tgt[..., 0] > 1) & (tgt[..., 1] > 1)  # (B, J)
    if sample_mask is not None:
        valid = valid & (sample_mask[:, None] > 0)
    d = jnp.linalg.norm((pred - tgt) / norm, axis=-1)  # (B, J)

    hit = (d < thr) & valid
    return (jnp.sum(hit, axis=0).astype(jnp.float32),
            jnp.sum(valid, axis=0).astype(jnp.float32))


def pck_from_sums(hit_j: jnp.ndarray, valid_j: jnp.ndarray):
    """(per_joint (J,), avg, cnt) from per-joint hit/valid counts."""
    per_joint = jnp.where(
        valid_j > 0, hit_j / jnp.maximum(valid_j, 1), -1.0
    )
    cnt = jnp.sum(valid_j > 0)
    avg = jnp.where(
        cnt > 0, jnp.sum(jnp.where(per_joint >= 0, per_joint, 0.0)) / jnp.maximum(cnt, 1), 0.0
    )
    return per_joint, avg, cnt


# ---------------------------------------------------------------------------
# Soft-argmax decode (lib/core/inference.py:97-162)
# ---------------------------------------------------------------------------

def soft_argmax(heatmaps: jnp.ndarray, beta: float = 160.0):
    """Differentiable soft-argmax decode on NHWC heatmaps (B, H, W, J).

    Softmax(beta * heatmap) expectation over the coordinate grid, plus the
    heatmap value at the rounded coordinate as the confidence — matching
    `SoftArgmax2D` / `get_final_preds_using_softargmax`
    (lib/core/inference.py:97-131, beta=160 at the call site).

    Returns preds (B, J, 2) float32 and maxvals (B, J, 1).
    """
    b, h, w, j = heatmaps.shape
    hm = heatmaps.transpose(0, 3, 1, 2)  # (B, J, H, W)
    probs = jax.nn.softmax(hm.reshape(b, j, -1) * beta, axis=-1)
    probs = probs.reshape(b, j, h, w)
    ys = jnp.arange(h, dtype=jnp.float32)
    xs = jnp.arange(w, dtype=jnp.float32)
    px = jnp.sum(probs * xs[None, None, None, :], axis=(2, 3))
    py = jnp.sum(probs * ys[None, None, :, None], axis=(2, 3))
    preds = jnp.stack([px, py], axis=-1)

    ix = jnp.clip(jnp.round(px).astype(jnp.int32), 0, w - 1)
    iy = jnp.clip(jnp.round(py).astype(jnp.int32), 0, h - 1)
    flat = hm.reshape(b, j, h * w)
    maxvals = jnp.take_along_axis(flat, (iy * w + ix)[..., None], axis=2)
    return preds, maxvals


def get_final_preds_softargmax(
    heatmaps: jnp.ndarray,
    center: jnp.ndarray,
    scale: jnp.ndarray,
    beta: float = 160.0,
    post_process: bool = True,
):
    """Soft-argmax variant of get_final_preds
    (lib/core/inference.py:129-162)."""
    coords, maxvals = soft_argmax(heatmaps, beta)
    if post_process:
        coords = quarter_offset(heatmaps, coords)
    h, w = heatmaps.shape[1], heatmaps.shape[2]
    preds = transform_preds_jax(coords, center, scale, (w, h))
    return preds, maxvals
