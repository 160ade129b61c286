"""Corruption ops: run every type x severity, range/shape invariants,
severity monotonicity where it is well-defined."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from advmix_tpu.ops import corruptions as C


@pytest.fixture(scope="module")
def img():
    rng = np.random.RandomState(0)
    # structured image (gradients + texture) so blurs/contrast act nontrivially
    h, w = 64, 48
    yy, xx = np.mgrid[0:h, 0:w]
    base = np.stack(
        [
            128 + 100 * np.sin(xx / 5.0),
            128 + 100 * np.cos(yy / 7.0),
            (xx + yy) % 256,
        ],
        axis=-1,
    ).astype(np.float32)
    noise = rng.randint(-20, 20, (h, w, 3))
    return jnp.asarray(
        np.clip(base + noise, 0, 255)[None].repeat(2, 0).astype(np.float32)
    )


def test_registry_complete():
    assert len(C.BENCHMARK_CORRUPTIONS) == 15
    assert len(C.HOLDOUT_CORRUPTIONS) == 4
    assert set(C.ALL_CORRUPTIONS) == set(C.CORRUPTIONS)


@pytest.mark.parametrize("name", C.ALL_CORRUPTIONS)
def test_corruption_runs_all_severities(name, img):
    for sev in (1, 5):
        out = C.corrupt(img, name, sev, jax.random.PRNGKey(0))
        out = np.asarray(out)
        assert out.shape == img.shape, name
        assert np.isfinite(out).all(), name
        assert out.min() >= -0.5 and out.max() <= 255.5, (name, out.min(), out.max())
        assert not np.allclose(out, np.asarray(img)), f"{name} sev {sev} is a no-op"


@pytest.mark.parametrize(
    "name",
    ["gaussian_noise", "shot_noise", "impulse_noise", "speckle_noise",
     "gaussian_blur", "defocus_blur", "contrast", "pixelate",
     "jpeg_compression"],
)
def test_severity_monotone(name, img):
    key = jax.random.PRNGKey(1)
    errs = []
    for sev in (1, 3, 5):
        out = C.corrupt(img, name, sev, key)
        errs.append(float(jnp.mean(jnp.abs(out - img))))
    assert errs[0] < errs[-1], (name, errs)


def test_unknown_name_and_bad_severity(img):
    with pytest.raises(KeyError):
        C.corrupt(img, "nope", 1)
    with pytest.raises(ValueError):
        C.corrupt(img, "fog", 0)
    with pytest.raises(ValueError):
        C.corrupt(img, "fog", 6)


def test_corruptions_jittable(img):
    @jax.jit
    def f(x, key):
        return C.corrupt(x, "gaussian_noise", 3, key)

    out = f(img, jax.random.PRNGKey(0))
    assert out.shape == img.shape


def test_jpeg_blockiness(img):
    """JPEG at severity 5 should leave 8x8 block structure (higher variance
    of differences across block boundaries than within)."""
    out = np.asarray(C.corrupt(img, "jpeg_compression", 5))
    d = np.abs(np.diff(out, axis=2)).mean(axis=(0, 1, 3))  # per-column diffs
    boundary = d[7::8].mean()
    interior = np.delete(d, np.s_[7::8]).mean()
    assert boundary > interior * 0.8  # boundaries at least comparable
