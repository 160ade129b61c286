"""Batched on-device adversarial-augmentation views (AutoAugment + GridMask).

Behavioral reference: AdvMix `lib/dataset/advaug.py` — per-sample PIL
AutoAugment (ImageNet policy, 12 subpolicies over
equalize/posterize/solarize/invert/sharpness, `advaug.py:22-34`) and
GridMask (`grid_aug`, `advaug.py:111-170`: random period d in [2, min(h,w)),
ratio 0.5, mode=1 keep-grid, prob 0.7, rotate=1 which is a no-op since
randint(1)==0).

TPU-first redesign: the reference applies these on the host per image inside
DataLoader workers; here every op is a batched jax function over uint8-range
float images (B, H, W, 3) driven by a jax PRNG key, so the full 3-view
AdvMix batch is synthesized on device from one clean crop. Note the
reference only uses the *clean* view's target/weights for both D and G
losses (`lib/core/function.py:131-132`), so GridMask's joints_vis zeroing
never reaches training and is not reproduced here.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

# torchvision Normalize constants used by the reference (tools/train.py:116),
# pre-scaled to the [0, 255] pixel range
IMAGENET_MEAN_STD = (
    jnp.asarray([0.485, 0.456, 0.406], jnp.float32) * 255.0,
    jnp.asarray([0.229, 0.224, 0.225], jnp.float32) * 255.0,
)


# ---------------------------------------------------------------------------
# Pixel ops (PIL-compatible, on [0, 255] float, per-sample batched)
# ---------------------------------------------------------------------------

def invert(img: jnp.ndarray) -> jnp.ndarray:
    return 255.0 - img


def solarize(img: jnp.ndarray, threshold) -> jnp.ndarray:
    """PIL ImageOps.solarize: invert pixels >= threshold (on uint8)."""
    q = jnp.floor(img)
    return jnp.where(q >= threshold, 255.0 - img, img)


def posterize(img: jnp.ndarray, bits) -> jnp.ndarray:
    """PIL ImageOps.posterize: keep the top `bits` bits per channel."""
    shift = (2.0 ** (8 - bits)).astype(jnp.float32) if hasattr(bits, "astype") else float(2 ** (8 - bits))
    return jnp.floor(img / shift) * shift


def equalize(img: jnp.ndarray, hist_stride: int = 1,
             chunk: int = 64) -> jnp.ndarray:
    """PIL ImageOps.equalize, batched.

    PIL builds a per-channel LUT: step = (npixels - hist[last_nonzero]) // 255;
    lut[i] = (cumsum_before(i) + step // 2) // step.

    TPU formulation: per-pixel scatter (histogram) and gather (LUT apply)
    are serial on TPU; both become MXU matmuls via a TWO-LEVEL 16x16
    one-hot decomposition of the 8-bit value (v = 16*hi + lo):
      histogram: hist.reshape(16,16) == oh_hi^T @ oh_lo
      LUT apply: mapped = sum(oh_hi @ LUT.reshape(16,16) * oh_lo, -1)
    The (HW, 16) one-hots carry 8x fewer bytes than a 256-wide one-hot —
    the step is HBM-bound, and the old formulation was ~25 GB/step of the
    AdvMix program's traffic. Everything stays bit-exact: one-hots and
    LUT values (integers <= 255) are exact in bf16, accumulation is f32.

    hist_stride > 1 builds the LUT from a spatially-subsampled histogram —
    statistically indistinguishable for augmentation (the training path
    uses 2) but not PIL-bit-exact; keep 1 where exactness matters.
    """
    b, h, w, c = img.shape
    # uint8 quantized pixels: the (B*C, HW) transposed copies are 4x
    # smaller than int32 ("data formatting" was ~11 GB/step of the HBM-
    # bound AdvMix program)
    q = jnp.clip(jnp.floor(img), 0, 255).astype(jnp.uint8)  # (B,H,W,C)
    qs = q[:, ::hist_stride, ::hist_stride, :]
    n = float(qs.shape[1] * qs.shape[2])
    flat = q.transpose(0, 3, 1, 2).reshape(b * c, h * w)
    flat_s = qs.transpose(0, 3, 1, 2).reshape(b * c, -1)
    idx = jnp.arange(256)

    def body(args):
        # written per-row; lax.map's batch_size vmaps it over the chunk
        q_row, qs_row = args  # (HW,), (HWs,)
        q_row = q_row.astype(jnp.int32)
        qs_row = qs_row.astype(jnp.int32)
        oh_hi_s = jax.nn.one_hot(qs_row // 16, 16, dtype=jnp.bfloat16)
        oh_lo_s = jax.nn.one_hot(qs_row % 16, 16, dtype=jnp.bfloat16)
        hist = jax.lax.dot_general(
            oh_hi_s, oh_lo_s, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(256)  # hist[16*hi + lo]

        last_nz = jnp.argmax(jnp.where(hist > 0, idx, -1))
        hist_last = hist[last_nz]
        step = jnp.floor((n - hist_last) / 255.0)

        cum_before = jnp.cumsum(hist) - hist
        lut = jnp.floor(
            (cum_before + jnp.floor(step / 2.0)) / jnp.maximum(step, 1.0)
        )
        lut = jnp.clip(lut, 0, 255)
        # identity where step == 0 (PIL keeps the channel unchanged)
        lut = jnp.where(step > 0, lut, idx.astype(jnp.float32))

        oh_hi = jax.nn.one_hot(q_row // 16, 16, dtype=jnp.bfloat16)
        oh_lo = jax.nn.one_hot(q_row % 16, 16, dtype=jnp.bfloat16)
        rows = jax.lax.dot_general(
            oh_hi, lut.reshape(16, 16).astype(jnp.bfloat16),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (HW, 16)
        mapped = jnp.sum(rows * oh_lo.astype(jnp.float32), axis=1)
        return mapped

    mapped = jax.lax.map(body, (flat, flat_s), batch_size=chunk)
    return mapped.reshape(b, c, h, w).transpose(0, 2, 3, 1).astype(img.dtype)


def _smooth_filter(img: jnp.ndarray) -> jnp.ndarray:
    """PIL ImageFilter.SMOOTH: 3x3 kernel [[1,1,1],[1,5,1],[1,1,1]]/13 on the
    interior; PIL leaves the 1px border unchanged."""
    k = jnp.array([[1, 1, 1], [1, 5, 1], [1, 1, 1]], jnp.float32) / 13.0
    kern = jnp.zeros((3, 3, 1, 1), jnp.float32).at[:, :, 0, 0].set(k)
    kern = kern.astype(img.dtype)
    b, h, w, c = img.shape
    x = img.transpose(0, 3, 1, 2).reshape(b * c, h, w, 1)
    sm = jax.lax.conv_general_dilated(
        x, kern, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    sm = sm.reshape(b, c, h, w).transpose(0, 2, 3, 1)
    border = jnp.zeros((h, w), bool).at[1:-1, 1:-1].set(True)
    return jnp.where(border[None, :, :, None], sm, img)


def sharpness(img: jnp.ndarray, factor) -> jnp.ndarray:
    """PIL ImageEnhance.Sharpness: blend(smooth, img, factor).

    factor 0 -> fully smoothed, 1 -> original, >1 -> sharpened. PIL rounds
    the smoothed image to uint8 before blending."""
    sm = jnp.clip(jnp.round(_smooth_filter(img)), 0, 255)
    f = factor if isinstance(factor, float) else jnp.asarray(factor, img.dtype)
    out = sm + (img - sm) * f
    return jnp.clip(out, 0, 255)


# ---------------------------------------------------------------------------
# AutoAugment ImageNet policy (the 12 subpolicies used by AdvMix)
# ---------------------------------------------------------------------------

# (p1, op1, magnitude_idx1, p2, op2, magnitude_idx2) per advaug.py:22-34
_POLICIES = [
    (0.8, "equalize", 8, 0.6, "equalize", 3),
    (0.6, "posterize", 7, 0.6, "posterize", 6),
    (0.4, "equalize", 7, 0.2, "solarize", 4),
    (0.6, "solarize", 3, 0.6, "equalize", 7),
    (0.8, "posterize", 5, 1.0, "equalize", 2),
    (0.6, "equalize", 8, 0.4, "posterize", 6),
    (0.0, "equalize", 7, 0.8, "equalize", 8),
    (0.6, "invert", 4, 1.0, "equalize", 8),
    (0.4, "sharpness", 7, 0.6, "invert", 8),
    (0.4, "equalize", 7, 0.2, "solarize", 4),
    (0.6, "invert", 4, 1.0, "equalize", 8),
    (0.8, "equalize", 8, 0.6, "equalize", 3),
]

# magnitude tables (advaug.py:48-63); only ops appearing above are needed
_RANGES = {
    "posterize": np.round(np.linspace(8, 4, 10), 0).astype(int),
    "solarize": np.linspace(256, 0, 10),
    "sharpness": np.linspace(0.0, 0.9, 10),
    "equalize": [0] * 10,
    "invert": [0] * 10,
}


def _apply_op(img, op: str, magnitude: float, sign: jnp.ndarray,
              fast: bool = False):
    if op == "identity":
        return img
    if op == "equalize":
        # training path: subsampled histogram (statistically equivalent)
        return equalize(img, hist_stride=2 if fast else 1)
    if op == "invert":
        return invert(img)
    if op == "posterize":
        return posterize(img, int(magnitude))
    if op == "solarize":
        return solarize(img, float(magnitude))
    if op == "sharpness":
        # enhance(1 + m * random_sign)
        return sharpness(img, 1.0 + float(magnitude) * sign)
    raise ValueError(op)


def _stage_variants(stage: int):
    """Distinct (op, magnitude) variants appearing in stage 1 or 2 of the
    policy table, with a per-policy index into that variant bank. Variant 0
    is identity (used when the per-sample coin skips the op)."""
    variants = [("identity", 0.0)]
    index = []
    for pol in _POLICIES:
        p, op, mag_idx = pol[0 + 3 * stage], pol[1 + 3 * stage], pol[2 + 3 * stage]
        mag = float(_RANGES[op][mag_idx])
        key = (op, mag)
        if key not in variants:
            variants.append(key)
        index.append(variants.index(key))
    return variants, np.array(index)


def autoaugment(img: jnp.ndarray, key: jax.Array) -> jnp.ndarray:
    """Apply a random ImageNet subpolicy per sample (batched).

    img: (B, H, W, 3) float in [0, 255]. One policy index, two application
    coins, and one magnitude sign are drawn per sample.

    TPU-friendly evaluation: each stage computes its few distinct primitive
    variants ONCE on the whole batch (the 12 subpolicies share ~6 variants
    per stage — notably equalize, the expensive one, runs once per stage
    instead of up to 18 times), then per-sample gather selects the variant.
    """
    b = img.shape[0]
    k_pol, k_p1, k_p2, k_sign = jax.random.split(key, 4)
    pol_idx = jax.random.randint(k_pol, (b,), 0, len(_POLICIES))
    u1 = jax.random.uniform(k_p1, (b,))
    u2 = jax.random.uniform(k_p2, (b,))
    sign = jnp.where(jax.random.bernoulli(k_sign, 0.5, (b,)), 1.0, -1.0)
    sign = sign[:, None, None, None].astype(img.dtype)

    probs = np.array([(p[0], p[3]) for p in _POLICIES])  # (P, 2)

    out = img
    for stage, coin in ((0, u1), (1, u2)):
        variants, pol_to_variant = _stage_variants(stage)
        vidx = jnp.asarray(pol_to_variant)[pol_idx]  # (B,)
        apply_p = jnp.asarray(probs[:, stage])[pol_idx]  # (B,)
        vidx = jnp.where(coin < apply_p, vidx, 0)  # identity when coin fails
        # per-sample select as a where-chain (variant 0 = identity = `out`):
        # XLA fuses the selects into the variant producers, where a stacked
        # bank + take_along_axis materializes the (V, B, H, W, 3) bank and
        # layout-copies it before the gather (~2 ms/step measured at
        # batch 128 on v5e)
        sel = out
        for v, (op, mag) in enumerate(variants[1:], start=1):
            cand = _apply_op(out, op, mag, sign, fast=True)
            m = (vidx == v)[:, None, None, None]
            sel = jnp.where(m, cand, sel)
        out = sel
    return out


# ---------------------------------------------------------------------------
# GridMask (advaug.py:111-170 with the call-site constants)
# ---------------------------------------------------------------------------

def gridmask(
    img: jnp.ndarray,
    key: jax.Array,
    ratio: float = 0.5,
    mode: int = 1,
    prob: float = 0.7,
) -> jnp.ndarray:
    """Batched GridMask. img: (B, H, W, C) float.

    Per sample: with prob `prob`, draw period d ~ U[2, min(h,w)), strip
    width l = clip(int(d*ratio+0.5), 1, d-1), offsets st_h, st_w ~ U[0, d),
    build the 1.5x mask, center-crop, invert (mode=1), multiply.
    """
    b, h, w, c = img.shape
    k_apply, k_d, k_sh, k_sw = jax.random.split(key, 4)
    apply_mask = jax.random.bernoulli(k_apply, prob, (b,))
    d = jax.random.randint(k_d, (b,), 2, min(h, w))
    l = jnp.clip(jnp.floor(d * ratio + 0.5).astype(jnp.int32), 1, d - 1)
    st_h = jax.random.randint(k_sh, (b,), 0, 2**30) % d
    st_w = jax.random.randint(k_sw, (b,), 0, 2**30) % d

    hh, ww = int(1.5 * h), int(1.5 * w)
    off_h, off_w = (hh - h) // 2, (ww - w) // 2

    ys = jnp.arange(h) + off_h  # coords in the 1.5x canvas
    xs = jnp.arange(w) + off_w

    def strips(coords, st, dd, ll):
        # zeroed rows: s = dd*i + st for i >= 0 -> (coord - st) mod dd < ll
        rel = coords[None, :] - st[:, None]
        return (rel >= 0) & (jnp.mod(rel, dd[:, None]) < ll[:, None])

    row = strips(ys, st_h, d, l)  # (B, H)
    col = strips(xs, st_w, d, l)  # (B, W)
    zeroed = row[:, :, None] | col[:, None, :]  # (B, H, W)
    mask = zeroed if mode == 1 else ~zeroed  # mode=1 inverts (keep strips)
    mask = mask.astype(img.dtype)
    mask = jnp.where(apply_mask[:, None, None], mask, jnp.ones_like(mask))
    return img * mask[..., None]


# ---------------------------------------------------------------------------
# 3-view synthesis for AdvMix
# ---------------------------------------------------------------------------

def make_advmix_views(
    clean: jnp.ndarray,  # (B, H, W, 3) float [0, 255]
    key: jax.Array,
    normalize_mean=None,
    normalize_std=None,
    out_dtype=None,  # e.g. jnp.bfloat16: halves the (B,H,W,9) HBM traffic
    style_mask: jnp.ndarray | None = None,  # (B,) 1.0 where sample is styled
    compute_dtype=None,  # bfloat16 runs the whole synthesis at half traffic
) -> jnp.ndarray:
    """Build the channel-concat (B, H, W, 9) [clean, autoaug, gridmask]
    views, each normalized like torchvision ToTensor+Normalize
    (JointsDataset `transform`).

    style_mask implements the --sp_style exemption (`advaug.py:182,192`):
    stylized samples skip AutoAugment and GridMask — their 3 views are all
    the normalized stylized image.

    compute_dtype=bfloat16: the AdvMix step is HBM-bound; uint8-range pixel
    values (integers <= 255) are exact in bf16, so the augment pipeline
    loses at most 1 LSB (sharpness' fractional smoothing) while halving
    its bytes."""
    if compute_dtype is not None:
        clean = clean.astype(compute_dtype)
    k_aa, k_gm = jax.random.split(key)
    aa = autoaugment(clean, k_aa)

    if normalize_mean is None:
        mean, std = IMAGENET_MEAN_STD
    else:
        mean = jnp.asarray(normalize_mean, clean.dtype) * 255.0
        std = jnp.asarray(normalize_std, clean.dtype) * 255.0

    def norm(x):
        return (x - mean.astype(x.dtype)) / std.astype(x.dtype)

    # GridMask runs on the *normalized* tensor in the reference
    # (advaug.py:190-202: transform first, then grid_aug), so masked pixels
    # are exactly 0 in normalized space.
    clean_n = norm(clean)
    aa_n = norm(aa)
    gm = gridmask(clean_n, k_gm)
    if style_mask is not None:
        m = (style_mask > 0.5).reshape(-1, 1, 1, 1)
        aa_n = jnp.where(m, clean_n, aa_n)
        gm = jnp.where(m, clean_n, gm)
    views = jnp.concatenate([clean_n, aa_n, gm], axis=-1)
    return views if out_dtype is None else views.astype(out_dtype)
