"""On-device augmentation ops vs PIL oracles."""

import numpy as np
import jax
import jax.numpy as jnp
from PIL import Image, ImageEnhance, ImageOps

from advmix_tpu.ops import augment as A


def _rand_img(rng, h=24, w=20):
    return rng.randint(0, 256, (h, w, 3)).astype(np.uint8)


def test_invert_solarize_posterize_match_pil():
    rng = np.random.RandomState(0)
    img = _rand_img(rng)
    x = jnp.asarray(img[None].astype(np.float32))

    ref = np.asarray(ImageOps.invert(Image.fromarray(img)))
    np.testing.assert_allclose(np.asarray(A.invert(x))[0], ref, atol=1e-4)

    for thr in [0, 85.33, 128, 256]:
        ref = np.asarray(ImageOps.solarize(Image.fromarray(img), thr))
        ours = np.asarray(A.solarize(x, thr))[0]
        np.testing.assert_allclose(ours, ref, atol=1e-4), thr

    for bits in [4, 5, 6, 7, 8]:
        ref = np.asarray(ImageOps.posterize(Image.fromarray(img), bits))
        ours = np.asarray(A.posterize(x, bits))[0]
        np.testing.assert_allclose(ours, ref, atol=1e-4), bits


def test_equalize_matches_pil():
    rng = np.random.RandomState(1)
    for trial in range(3):
        img = _rand_img(rng, 32, 16)
        x = jnp.asarray(img[None].astype(np.float32))
        ref = np.asarray(ImageOps.equalize(Image.fromarray(img)))
        ours = np.asarray(A.equalize(x))[0]
        np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_equalize_constant_channel():
    img = np.full((8, 8, 3), 77, np.uint8)
    ref = np.asarray(ImageOps.equalize(Image.fromarray(img)))
    ours = np.asarray(A.equalize(jnp.asarray(img[None].astype(np.float32))))[0]
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_sharpness_matches_pil():
    rng = np.random.RandomState(2)
    img = _rand_img(rng, 16, 16)
    x = jnp.asarray(img[None].astype(np.float32))
    for f in [0.1, 1.0, 1.9]:
        ref = np.asarray(
            ImageEnhance.Sharpness(Image.fromarray(img)).enhance(f)
        ).astype(np.float32)
        ours = np.asarray(A.sharpness(x, f))[0]
        # PIL rounds the smoothed intermediate; allow 1-level differences
        assert np.abs(ours - ref).max() <= 1.0 + 1e-4, f


def test_autoaugment_runs_and_varies():
    rng = np.random.RandomState(3)
    img = jnp.asarray(
        rng.randint(0, 256, (6, 16, 16, 3)).astype(np.float32)
    )
    out = A.autoaugment(img, jax.random.PRNGKey(0))
    assert out.shape == img.shape
    assert np.asarray(out).min() >= 0 and np.asarray(out).max() <= 255
    out2 = A.autoaugment(img, jax.random.PRNGKey(1))
    assert not np.allclose(np.asarray(out), np.asarray(out2))


def test_gridmask_structure():
    rng = np.random.RandomState(4)
    img = jnp.ones((8, 32, 32, 3), jnp.float32)
    out = np.asarray(A.gridmask(img, jax.random.PRNGKey(0), prob=1.0))
    # mode=1 keeps only the strip union: some pixels zeroed, some kept
    per_sample_kept = out.reshape(8, -1).mean(axis=1)
    assert np.all(per_sample_kept > 0.0) and np.all(per_sample_kept < 1.0)
    # mask is identical across channels
    assert np.allclose(out[..., 0], out[..., 1])
    # prob=0 -> untouched
    out0 = np.asarray(A.gridmask(img, jax.random.PRNGKey(0), prob=0.0))
    assert np.allclose(out0, 1.0)


def test_make_advmix_views():
    rng = np.random.RandomState(5)
    clean = jnp.asarray(rng.randint(0, 256, (4, 32, 32, 3)).astype(np.float32))
    views = A.make_advmix_views(clean, jax.random.PRNGKey(0))
    assert views.shape == (4, 32, 32, 9)
    v = np.asarray(views)
    # clean view is normalized: mean approx 0-ish, finite
    assert np.isfinite(v).all()
    mean = np.asarray(jnp.asarray([0.485, 0.456, 0.406])) * 255
    std = np.asarray(jnp.asarray([0.229, 0.224, 0.225])) * 255
    np.testing.assert_allclose(
        v[..., :3], (np.asarray(clean) - mean) / std, atol=1e-4
    )
