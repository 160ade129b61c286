"""Pose losses, NHWC, fully jittable.

Behavioral reference: AdvMix `lib/core/loss.py`.

The reference's `JointsMSELoss` has an inverted flag quirk
(`lib/core/loss.py:16-21`): the default `smooth_L1=False` selects
`nn.SmoothL1Loss`, and `smooth_L1=True` selects plain MSE. All reference
call sites use the default, so the effective training criterion is SmoothL1
(beta=1) on heatmaps — per joint: 0.5 * mean(criterion), summed over joints,
divided by num_joints, with optional per-joint target_weight multiply.
We preserve those numerics; the config flag LOSS.SMOOTH_L1 carries the same
inverted meaning for YAML compatibility.
"""

from __future__ import annotations

import jax.numpy as jnp


def smooth_l1(x: jnp.ndarray) -> jnp.ndarray:
    """Elementwise SmoothL1 (Huber, beta=1): 0.5x^2 if |x|<1 else |x|-0.5."""
    ax = jnp.abs(x)
    return jnp.where(ax < 1.0, 0.5 * x * x, ax - 0.5)


def joints_loss(
    output: jnp.ndarray,  # (B, H, W, J)
    target: jnp.ndarray,  # (B, H, W, J)
    target_weight: jnp.ndarray,  # (B, J)
    use_target_weight: bool = True,
    criterion: str = "smooth_l1",  # 'smooth_l1' (reference default) | 'mse'
) -> jnp.ndarray:
    """JointsMSELoss equivalent: 0.5 * mean-per-joint criterion, averaged
    over joints (`lib/core/loss.py:46-65`)."""
    b = output.shape[0]
    j = output.shape[-1]
    pred = output.reshape(b, -1, j)  # (B, HW, J)
    gt = target.reshape(b, -1, j)

    if use_target_weight:
        w = target_weight[:, None, :]  # (B, 1, J)
        pred = pred * w
        gt = gt * w

    diff = pred - gt
    if criterion == "mse":
        per_elem = diff * diff
    else:
        per_elem = smooth_l1(diff)
    # mean over (B, HW) per joint, then 0.5 * sum / J
    per_joint = jnp.mean(per_elem, axis=(0, 1))  # (J,)
    return 0.5 * jnp.sum(per_joint) / j


def joints_loss_per_sample(
    output: jnp.ndarray,
    target: jnp.ndarray,
    target_weight: jnp.ndarray,
    use_target_weight: bool = True,
    criterion: str = "smooth_l1",
) -> jnp.ndarray:
    """Per-sample joints_loss, shape (B,): `jnp.mean(...)` of the result
    equals `joints_loss(...)`. Used by the eval step to mask padded tail
    rows (the Loader repeats the last sample to keep compiled shapes
    static) out of the logged metrics."""
    b = output.shape[0]
    j = output.shape[-1]
    pred = output.reshape(b, -1, j)
    gt = target.reshape(b, -1, j)
    if use_target_weight:
        w = target_weight[:, None, :]
        pred = pred * w
        gt = gt * w
    diff = pred - gt
    per_elem = diff * diff if criterion == "mse" else smooth_l1(diff)
    per_sj = jnp.mean(per_elem, axis=1)  # (B, J)
    return 0.5 * jnp.sum(per_sj, axis=-1) / j


def joints_ohkm_loss(
    output: jnp.ndarray,
    target: jnp.ndarray,
    target_weight: jnp.ndarray,
    use_target_weight: bool = True,
    topk: int = 8,
) -> jnp.ndarray:
    """Online hard-keypoint-mining MSE (`lib/core/loss.py:68-110`):
    per-(sample, joint) 0.5*MSE, keep the top-k hardest joints per sample."""
    b = output.shape[0]
    j = output.shape[-1]
    pred = output.reshape(b, -1, j)
    gt = target.reshape(b, -1, j)
    if use_target_weight:
        w = target_weight[:, None, :]
        pred = pred * w
        gt = gt * w
    per_joint = 0.5 * jnp.mean((pred - gt) ** 2, axis=1)  # (B, J)
    topk_vals = jnp.sort(per_joint, axis=1)[:, -topk:]
    return jnp.mean(jnp.sum(topk_vals, axis=1) / topk)


def joints_ohkm_loss_per_sample(
    output: jnp.ndarray,
    target: jnp.ndarray,
    target_weight: jnp.ndarray,
    use_target_weight: bool = True,
    topk: int = 8,
) -> jnp.ndarray:
    """Per-sample OHKM loss, shape (B,); mean equals joints_ohkm_loss."""
    b = output.shape[0]
    j = output.shape[-1]
    pred = output.reshape(b, -1, j)
    gt = target.reshape(b, -1, j)
    if use_target_weight:
        w = target_weight[:, None, :]
        pred = pred * w
        gt = gt * w
    per_joint = 0.5 * jnp.mean((pred - gt) ** 2, axis=1)
    topk_vals = jnp.sort(per_joint, axis=1)[:, -topk:]
    return jnp.sum(topk_vals, axis=1) / topk
