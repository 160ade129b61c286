"""Golden-parity tests for geometric transforms against cv2 and the
reference's documented conventions (AdvMix lib/utils/transforms.py)."""

import cv2
import numpy as np
import jax.numpy as jnp
import pytest

from advmix_tpu.ops import transforms as T


def _cv2_affine(center, scale, rot, output_size, shift=(0, 0), inv=0):
    """Reconstruct the reference's cv2-based matrix for comparison."""
    scale_tmp = np.array(scale) * 200.0
    src_w = scale_tmp[0]
    dst_w, dst_h = output_size
    rot_rad = np.pi * rot / 180
    sn, cs = np.sin(rot_rad), np.cos(rot_rad)
    src_dir = np.array([0 * cs - (-0.5 * src_w) * sn, 0 * sn + (-0.5 * src_w) * cs])
    dst_dir = np.array([0, dst_w * -0.5], np.float32)
    src = np.zeros((3, 2), dtype=np.float32)
    dst = np.zeros((3, 2), dtype=np.float32)
    src[0] = np.array(center) + scale_tmp * np.array(shift)
    src[1] = np.array(center) + src_dir + scale_tmp * np.array(shift)
    dst[0] = [dst_w * 0.5, dst_h * 0.5]
    dst[1] = np.array([dst_w * 0.5, dst_h * 0.5]) + dst_dir
    d = src[0] - src[1]
    src[2] = src[1] + np.array([-d[1], d[0]])
    d = dst[0] - dst[1]
    dst[2] = dst[1] + np.array([-d[1], d[0]])
    if inv:
        return cv2.getAffineTransform(np.float32(dst), np.float32(src))
    return cv2.getAffineTransform(np.float32(src), np.float32(dst))


CASES = [
    ((120.0, 150.0), (1.2, 1.6), 0.0, (192, 256)),
    ((50.5, 70.25), (0.8, 0.8), 30.0, (256, 256)),
    ((300.0, 200.0), (2.0, 1.5), -45.0, (192, 256)),
    ((10.0, 10.0), (0.5, 0.9), 137.0, (64, 64)),
]


@pytest.mark.parametrize("center,scale,rot,osize", CASES)
def test_affine_matches_cv2(center, scale, rot, osize):
    ours = T.get_affine_transform(center, scale, rot, osize)
    ref = _cv2_affine(center, scale, rot, osize)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-3)


@pytest.mark.parametrize("center,scale,rot,osize", CASES)
def test_affine_inverse_matches_cv2(center, scale, rot, osize):
    ours = T.get_affine_transform(center, scale, rot, osize, inv=True)
    ref = _cv2_affine(center, scale, rot, osize, inv=1)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-3)


def test_affine_jax_matches_numpy():
    centers = np.array([c for c, *_ in CASES], np.float32)
    scales = np.array([s for _, s, *_ in CASES], np.float32)
    rots = np.array([r for _, _, r, _ in CASES], np.float32)
    osize = (192, 256)
    batched = T.get_affine_transform_jax(
        jnp.asarray(centers), jnp.asarray(scales), jnp.asarray(rots), osize
    )
    for i in range(len(CASES)):
        ref = T.get_affine_transform(centers[i], scales[i], rots[i], osize)
        np.testing.assert_allclose(np.asarray(batched[i]), ref, rtol=1e-4, atol=1e-3)
    inv = T.get_affine_transform_jax(
        jnp.asarray(centers), jnp.asarray(scales), jnp.asarray(rots), osize, inv=True
    )
    for i in range(len(CASES)):
        ref = T.get_affine_transform(centers[i], scales[i], rots[i], osize, inv=True)
        np.testing.assert_allclose(np.asarray(inv[i]), ref, rtol=1e-4, atol=1e-3)


def test_warp_affine_matches_cv2():
    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, (320, 240, 3)).astype(np.float32)
    center, scale, rot, osize = (120.0, 150.0), (0.9, 1.2), 25.0, (192, 256)
    m = T.get_affine_transform(center, scale, rot, osize)
    ref = cv2.warpAffine(img, m, osize, flags=cv2.INTER_LINEAR)
    ours = T.warp_affine(
        jnp.asarray(img)[None], jnp.asarray(m, dtype=jnp.float32)[None], osize
    )[0]
    # cv2 quantizes bilinear weights to 1/32 (INTER_BITS=5); allow for that.
    diff = np.abs(np.asarray(ours) - ref)
    assert np.median(diff) < 1.0
    assert np.percentile(diff, 99) < 8.0


def test_invert_affine():
    m = jnp.asarray(
        T.get_affine_transform((120.0, 150.0), (1.2, 1.6), 33.0, (192, 256)),
        jnp.float32,
    )[None]
    inv = T.invert_affine(m)
    pts = jnp.array([[10.0, 20.0], [100.0, 200.0]])
    fwd = T.affine_transform_points(pts, m[0])
    back = T.affine_transform_points(fwd, inv[0])
    np.testing.assert_allclose(np.asarray(back), np.asarray(pts), atol=1e-3)


def test_transform_preds_matches_reference():
    coords = np.array([[[3.0, 4.0], [40.0, 60.0], [0.0, 0.0]]], np.float32)
    center = np.array([[150.0, 100.0]], np.float32)
    scale = np.array([[1.1, 1.4]], np.float32)
    out = T.transform_preds_jax(
        jnp.asarray(coords), jnp.asarray(center), jnp.asarray(scale), (48, 64)
    )
    ref = T.transform_preds(coords[0], center[0], scale[0], (48, 64))
    np.testing.assert_allclose(np.asarray(out[0]), ref, rtol=1e-4, atol=1e-3)


def test_fliplr_joints():
    joints = np.array([[10.0, 20.0, 0.0], [30.0, 40.0, 0.0]])
    vis = np.array([[1.0, 1.0, 0.0], [0.0, 0.0, 0.0]])
    out_j, out_v = T.fliplr_joints(joints, vis, 100, [[0, 1]])
    # pair swapped, x mirrored, masked by visibility
    np.testing.assert_allclose(out_v, [[0, 0, 0], [1, 1, 0]])
    np.testing.assert_allclose(out_j[1], [100 - 10 - 1, 20, 0])
    np.testing.assert_allclose(out_j[0], [0, 0, 0])


def test_flip_back_and_shift():
    hm = np.zeros((1, 4, 6, 2), np.float32)
    hm[0, 1, 2, 0] = 1.0  # joint 0 at x=2
    hm[0, 3, 5, 1] = 2.0  # joint 1 at x=5
    out = np.asarray(T.flip_back(jnp.asarray(hm), [[0, 1]]))
    # after W-flip joint0 peak moves to x = 6-1-2 = 3; channels swap
    assert out[0, 1, 3, 1] == 1.0
    assert out[0, 3, 0, 0] == 2.0

    shifted = np.asarray(T.shift_heatmap_right(jnp.asarray(hm)))
    assert shifted[0, 1, 3, 0] == 1.0
    assert shifted[0, 1, 2, 0] == 0.0
    assert shifted[0, 3, 0, 1] == 0.0  # column 0 keeps old value (was 0)
