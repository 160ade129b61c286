"""Geometric transforms: affine construction, batched on-device warping,
prediction back-projection, and flip helpers.

Behavioral reference: AdvMix `lib/utils/transforms.py:16-133` (affine built
from a 3-point correspondence with the scale*200px convention;
`cv2.warpAffine(INTER_LINEAR)` for the crop; `transform_preds` maps heatmap
coords back to the original image through the inverse affine).

TPU-first design: the host only computes the tiny 2x3 matrices (numpy, exact
cv2 parity); all pixel work — the bilinear inverse warp, flips — is batched
jax that runs on device inside the jitted step. Heatmaps use NHWC layout
(B, H, W, J).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

PIXEL_STD = 200.0


# ---------------------------------------------------------------------------
# Host-side (numpy) affine construction — exact cv2.getAffineTransform parity
# ---------------------------------------------------------------------------

def _rotate_point(pt, rot_rad):
    sn, cs = np.sin(rot_rad), np.cos(rot_rad)
    return np.array(
        [pt[0] * cs - pt[1] * sn, pt[0] * sn + pt[1] * cs], dtype=np.float32
    )


def _third_point(a, b):
    # Complete the right triangle: b + perp(a - b), perp([x,y]) = [-y, x].
    d = a - b
    return b + np.array([-d[1], d[0]], dtype=np.float32)


def _solve_affine(src: np.ndarray, dst: np.ndarray) -> np.ndarray:
    """2x3 affine M with M @ [x, y, 1]^T = dst for each of 3 point pairs.

    Same linear system cv2.getAffineTransform solves.
    """
    x = np.concatenate([src.astype(np.float64), np.ones((3, 1))], axis=1)
    m = np.linalg.solve(x, dst.astype(np.float64))  # (3, 2)
    return m.T  # (2, 3)


def get_affine_transform(
    center,
    scale,
    rot,
    output_size,
    shift=(0.0, 0.0),
    inv: bool = False,
) -> np.ndarray:
    """Crop transform from (center, scale[, rot]) to output_size [w, h].

    `scale` is in units of PIXEL_STD(=200) pixels, matching the reference
    convention (`lib/utils/transforms.py:77`). Returns a float64 (2, 3)
    matrix identical (to solver rounding) to the reference's cv2 output.
    """
    center = np.asarray(center, dtype=np.float32)
    scale = np.asarray(scale, dtype=np.float32)
    if scale.ndim == 0:
        scale = np.array([scale, scale], dtype=np.float32)
    shift = np.asarray(shift, dtype=np.float32)

    scale_tmp = scale * PIXEL_STD
    src_w = scale_tmp[0]
    dst_w, dst_h = float(output_size[0]), float(output_size[1])

    rot_rad = np.pi * float(rot) / 180.0
    src_dir = _rotate_point(np.array([0.0, src_w * -0.5], np.float32), rot_rad)
    dst_dir = np.array([0.0, dst_w * -0.5], np.float32)

    src = np.zeros((3, 2), dtype=np.float32)
    dst = np.zeros((3, 2), dtype=np.float32)
    src[0] = center + scale_tmp * shift
    src[1] = center + src_dir + scale_tmp * shift
    dst[0] = [dst_w * 0.5, dst_h * 0.5]
    dst[1] = dst[0] + dst_dir
    src[2] = _third_point(src[0], src[1])
    dst[2] = _third_point(dst[0], dst[1])

    if inv:
        return _solve_affine(dst, src)
    return _solve_affine(src, dst)


def affine_transform(pt, t) -> np.ndarray:
    """Apply a 2x3 affine to a single (x, y) point (host side)."""
    p = np.array([pt[0], pt[1], 1.0])
    return (t @ p)[:2]


def transform_preds(coords, center, scale, output_size) -> np.ndarray:
    """Map (J, 2) heatmap-space coords back to original-image coords."""
    trans = get_affine_transform(center, scale, 0, output_size, inv=True)
    ones = np.ones((coords.shape[0], 1))
    homog = np.concatenate([coords[:, :2], ones], axis=1)
    return homog @ trans.T


def fliplr_joints(joints, joints_vis, width, matched_parts):
    """Horizontally flip joint coordinates and swap left/right pairs.

    Matches `lib/utils/transforms.py:44-58` including the final
    joints * joints_vis masking.
    """
    joints = joints.copy()
    joints_vis = joints_vis.copy()
    joints[:, 0] = width - joints[:, 0] - 1
    for a, b in matched_parts:
        joints[[a, b]] = joints[[b, a]]
        joints_vis[[a, b]] = joints_vis[[b, a]]
    return joints * joints_vis, joints_vis


# ---------------------------------------------------------------------------
# Device-side (jax) batched versions
# ---------------------------------------------------------------------------

def get_affine_transform_jax(
    center: jnp.ndarray,  # (B, 2)
    scale: jnp.ndarray,  # (B, 2)
    rot: jnp.ndarray,  # (B,) degrees
    output_size,  # (w, h) static
    inv: bool = False,
) -> jnp.ndarray:
    """Batched affine construction on device. Returns (B, 2, 3) float32.

    The reference's 3-point construction always defines a *similarity*
    transform (both triangles are congruent right triangles built the same
    way), so instead of solving the generic 3x3 system (ill-conditioned in
    fp32 for large pixel coordinates) we use the exact closed form:
    A = (dst_w / src_w) * R(-rot), t = dst_center - A @ src_center."""
    dst_w, dst_h = float(output_size[0]), float(output_size[1])
    scale_tmp = scale * PIXEL_STD
    src_w = scale_tmp[:, 0]

    rot_rad = rot * (jnp.pi / 180.0)
    sn, cs = jnp.sin(rot_rad), jnp.cos(rot_rad)
    k = dst_w / src_w  # (B,)

    # Linear part: k * R(-rot) = k * [[cos, sin], [-sin, cos]]
    a00, a01 = k * cs, k * sn
    a10, a11 = -k * sn, k * cs

    dst0_x = jnp.full_like(k, dst_w * 0.5)
    dst0_y = jnp.full_like(k, dst_h * 0.5)
    cx, cy = center[:, 0], center[:, 1]

    if inv:
        # Inverse similarity: A' = (1/k) * R(rot), t' = src0 - A' @ dst0
        i00, i01 = cs / k, -sn / k
        i10, i11 = sn / k, cs / k
        tx = cx - (i00 * dst0_x + i01 * dst0_y)
        ty = cy - (i10 * dst0_x + i11 * dst0_y)
        row0 = jnp.stack([i00, i01, tx], axis=-1)
        row1 = jnp.stack([i10, i11, ty], axis=-1)
        return jnp.stack([row0, row1], axis=-2)

    tx = dst0_x - (a00 * cx + a01 * cy)
    ty = dst0_y - (a10 * cx + a11 * cy)
    row0 = jnp.stack([a00, a01, tx], axis=-1)
    row1 = jnp.stack([a10, a11, ty], axis=-1)
    return jnp.stack([row0, row1], axis=-2)


def invert_affine(m: jnp.ndarray) -> jnp.ndarray:
    """Invert (..., 2, 3) affine matrices."""
    a, b, tx = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    c, d, ty = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    det = a * d - b * c
    ia, ib = d / det, -b / det
    ic, id_ = -c / det, a / det
    itx = -(ia * tx + ib * ty)
    ity = -(ic * tx + id_ * ty)
    row0 = jnp.stack([ia, ib, itx], axis=-1)
    row1 = jnp.stack([ic, id_, ity], axis=-1)
    return jnp.stack([row0, row1], axis=-2)


def warp_affine(
    images: jnp.ndarray,  # (B, Hs, Ws, C) float
    mats: jnp.ndarray,  # (B, 2, 3) forward transform src->dst
    out_size,  # (w, h) static
    fill_value: float = 0.0,
) -> jnp.ndarray:
    """Batched bilinear inverse warp ≡ cv2.warpAffine(INTER_LINEAR,
    BORDER_CONSTANT) up to cv2's fixed-point interpolation quantization.

    Runs fully on device; this replaces the reference's per-image host
    cv2.warpAffine (`lib/dataset/JointsDataset.py:191-195`)."""
    out_w, out_h = int(out_size[0]), int(out_size[1])
    b, hs, ws, c = images.shape
    inv = invert_affine(mats.astype(jnp.float32))  # dst -> src

    ys = jnp.arange(out_h, dtype=jnp.float32)
    xs = jnp.arange(out_w, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(xs, ys)  # (out_h, out_w)

    # src coords per batch: (B, out_h, out_w)
    sx = (
        inv[:, 0, 0, None, None] * gx
        + inv[:, 0, 1, None, None] * gy
        + inv[:, 0, 2, None, None]
    )
    sy = (
        inv[:, 1, 0, None, None] * gx
        + inv[:, 1, 1, None, None] * gy
        + inv[:, 1, 2, None, None]
    )

    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    wx = sx - x0
    wy = sy - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def gather(yi, xi):
        valid = (xi >= 0) & (xi < ws) & (yi >= 0) & (yi < hs)
        xi_c = jnp.clip(xi, 0, ws - 1)
        yi_c = jnp.clip(yi, 0, hs - 1)
        flat = images.reshape(b, hs * ws, c)
        idx = yi_c * ws + xi_c  # (B, out_h, out_w)
        vals = jnp.take_along_axis(
            flat, idx.reshape(b, -1, 1), axis=1
        ).reshape(b, out_h, out_w, c)
        return jnp.where(valid[..., None], vals, fill_value)

    v00 = gather(y0i, x0i)
    v01 = gather(y0i, x0i + 1)
    v10 = gather(y0i + 1, x0i)
    v11 = gather(y0i + 1, x0i + 1)

    wx = wx[..., None]
    wy = wy[..., None]
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


def affine_transform_points(
    pts: jnp.ndarray,  # (..., 2)
    mats: jnp.ndarray,  # broadcastable (..., 2, 3)
) -> jnp.ndarray:
    """Apply affine matrices to points (device)."""
    x = mats[..., 0, 0] * pts[..., 0] + mats[..., 0, 1] * pts[..., 1] + mats[..., 0, 2]
    y = mats[..., 1, 0] * pts[..., 0] + mats[..., 1, 1] * pts[..., 1] + mats[..., 1, 2]
    return jnp.stack([x, y], axis=-1)


def transform_preds_jax(
    coords: jnp.ndarray,  # (B, J, 2) heatmap-space coords
    center: jnp.ndarray,  # (B, 2)
    scale: jnp.ndarray,  # (B, 2)
    output_size,  # heatmap (w, h)
) -> jnp.ndarray:
    """Batched inverse mapping of predictions to original image coords.

    Device-side equivalent of `transform_preds` (lib/utils/transforms.py:61).
    """
    rot = jnp.zeros(center.shape[0], jnp.float32)
    inv = get_affine_transform_jax(center, scale, rot, output_size, inv=True)
    return affine_transform_points(coords, inv[:, None, :, :])


def flip_back(heatmaps: jnp.ndarray, flip_pairs) -> jnp.ndarray:
    """Undo a horizontal-flip TTA pass on NHWC heatmaps (B, H, W, J):
    flip W and swap left/right joint channels.

    Equivalent of `lib/utils/transforms.py:16-41` (which operates on NCHW).
    """
    flipped = heatmaps[:, :, ::-1, :]
    j = flipped.shape[-1]
    perm = np.arange(j)
    for a, b in flip_pairs:
        perm[a], perm[b] = perm[b], perm[a]
    return flipped[..., jnp.asarray(perm)]


def shift_heatmap_right(heatmaps: jnp.ndarray) -> jnp.ndarray:
    """TEST.SHIFT_HEATMAP: 1px right shift on the W axis (NHWC), matching
    `lib/core/function.py:258-260`. Column 0 keeps its original value."""
    return jnp.concatenate(
        [heatmaps[:, :, :1, :], heatmaps[:, :, :-1, :]], axis=2
    )
