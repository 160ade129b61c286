"""OKS-NMS and bbox NMS.

Behavioral reference: AdvMix `lib/nms/nms.py` (pure-numpy OKS greedy NMS
used on the eval path, `lib/dataset/coco.py:355-369`), `lib/nms/cpu_nms.pyx`
and the CUDA `lib/nms/nms_kernel.cu` bitmask kernel.

Three implementations, all behavior-equivalent:
- numpy oracle (host, reference semantics bit-for-bit)
- batched jax version: the O(N^2) OKS matrix is one vectorized program and
  greedy selection is a `lax.while_loop` over a suppression mask — this is
  the on-device path (TPU), also usable under vmap for per-image batches
- a Pallas tile kernel for the pairwise OKS matrix lives in
  ops/pallas/oks_kernel.py (the TPU analog of nms_kernel.cu's 64x64 tiles)

COCO keypoint sigmas per `lib/nms/nms.py:77`.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

COCO_SIGMAS = (
    np.array(
        [
            0.26, 0.25, 0.25, 0.35, 0.35, 0.79, 0.79, 0.72, 0.72,
            0.62, 0.62, 1.07, 1.07, 0.87, 0.87, 0.89, 0.89,
        ]
    )
    / 10.0
)


# ---------------------------------------------------------------------------
# numpy oracle (reference semantics)
# ---------------------------------------------------------------------------

def oks_iou_np(g, d, a_g, a_d, sigmas=None, in_vis_thre=None) -> np.ndarray:
    """OKS between one keypoint vector g (3J,) and rows of d (N, 3J)."""
    if sigmas is None:
        sigmas = COCO_SIGMAS
    variances = (sigmas * 2) ** 2
    xg, yg, vg = g[0::3], g[1::3], g[2::3]
    ious = np.zeros(d.shape[0])
    for i in range(d.shape[0]):
        xd, yd, vd = d[i, 0::3], d[i, 1::3], d[i, 2::3]
        e = ((xd - xg) ** 2 + (yd - yg) ** 2) / variances / (
            (a_g + a_d[i]) / 2 + np.spacing(1)
        ) / 2
        if in_vis_thre is not None:
            # reference quirk (`lib/nms/nms.py:91`): `list(vg > t) and
            # list(vd > t)` evaluates to the SECOND list (python `and` on a
            # non-empty list), so only d's visibility masks. Kept bit-for-bit
            # (dead in production: coco.py:355-363 never passes in_vis_thre).
            keep = vd > in_vis_thre
            e = e[keep]
        ious[i] = np.sum(np.exp(-e)) / e.shape[0] if e.shape[0] != 0 else 0.0
    return ious


def oks_nms_np(kpts, scores, areas, thresh, sigmas=None, in_vis_thre=None):
    """Greedy OKS NMS. kpts: (N, 3J) flat keypoints. Returns kept indices."""
    if len(kpts) == 0:
        return []
    order = scores.argsort()[::-1]
    keep = []
    while order.size > 0:
        i = order[0]
        keep.append(int(i))
        ious = oks_iou_np(
            kpts[i], kpts[order[1:]], areas[i], areas[order[1:]],
            sigmas, in_vis_thre,
        )
        order = order[1:][ious <= thresh]
    return keep


def soft_oks_nms_np(
    kpts, scores, areas, thresh, sigmas=None, in_vis_thre=None, max_dets=20
):
    """Gaussian soft OKS NMS (`lib/nms/nms.py:138-177`)."""
    if len(kpts) == 0:
        return []
    order = scores.argsort()[::-1]
    scores = scores[order].copy()
    keep = []
    while order.size > 0 and len(keep) < max_dets:
        i = order[0]
        ious = oks_iou_np(
            kpts[i], kpts[order[1:]], areas[i], areas[order[1:]],
            sigmas, in_vis_thre,
        )
        order = order[1:]
        scores = scores[1:] * np.exp(-(ious**2) / thresh)
        resort = scores.argsort()[::-1]
        order = order[resort]
        scores = scores[resort]
        keep.append(int(i))
    return keep


def bbox_nms_np(dets: np.ndarray, thresh: float):
    """Greedy IoU NMS on (N, 5) [x1, y1, x2, y2, score]
    (`lib/nms/nms.py:35-72` / `cpu_nms.pyx`)."""
    if dets.shape[0] == 0:
        return []
    x1, y1, x2, y2, scores = dets.T
    areas = (x2 - x1 + 1) * (y2 - y1 + 1)
    order = scores.argsort()[::-1]
    keep = []
    while order.size > 0:
        i = order[0]
        keep.append(int(i))
        xx1 = np.maximum(x1[i], x1[order[1:]])
        yy1 = np.maximum(y1[i], y1[order[1:]])
        xx2 = np.minimum(x2[i], x2[order[1:]])
        yy2 = np.minimum(y2[i], y2[order[1:]])
        w = np.maximum(0.0, xx2 - xx1 + 1)
        h = np.maximum(0.0, yy2 - yy1 + 1)
        inter = w * h
        ovr = inter / (areas[i] + areas[order[1:]] - inter)
        order = order[1:][ovr <= thresh]
    return keep


# ---------------------------------------------------------------------------
# jax (on-device) versions
# ---------------------------------------------------------------------------

def oks_matrix(
    kpts: jnp.ndarray,  # (N, J, 3)
    areas: jnp.ndarray,  # (N,)
    sigmas: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Full pairwise OKS matrix (N, N), vectorized (no vis threshold —
    the reference eval path passes in_vis_thre=None)."""
    if sigmas is None:
        sigmas = jnp.asarray(COCO_SIGMAS, jnp.float32)
    variances = (sigmas * 2.0) ** 2  # (J,)
    xy = kpts[..., :2]  # (N, J, 2)
    d2 = jnp.sum(
        (xy[:, None, :, :] - xy[None, :, :, :]) ** 2, axis=-1
    )  # (N, N, J) distances from g=i to d=j
    mean_area = (areas[:, None] + areas[None, :]) / 2.0 + 1e-16
    e = d2 / variances[None, None, :] / mean_area[..., None] / 2.0
    return jnp.mean(jnp.exp(-e), axis=-1)  # (N, N)


def oks_nms_jax(
    kpts: jnp.ndarray,  # (N, J, 3) padded
    scores: jnp.ndarray,  # (N,) padded with -inf for invalid rows
    areas: jnp.ndarray,  # (N,)
    thresh: float,
    valid: jnp.ndarray | None = None,  # (N,) bool
):
    """Greedy OKS NMS on device. Returns keep mask (N,) bool.

    Same selection order/suppression rule as the numpy oracle; runs as a
    while_loop keyed on the remaining-candidate mask, so it works under jit
    with static shapes.
    """
    n = kpts.shape[0]
    if valid is None:
        valid = jnp.ones((n,), bool)
    ious = oks_matrix(kpts, areas)
    neg_inf = jnp.float32(-jnp.inf)
    scores = jnp.where(valid, scores, neg_inf)

    def cond(state):
        remaining, _ = state
        return jnp.any(remaining)

    def body(state):
        remaining, keep = state
        cand_scores = jnp.where(remaining, scores, neg_inf)
        i = jnp.argmax(cand_scores)
        keep = keep.at[i].set(True)
        # suppress j with oks(i, j) > thresh (reference keeps <= thresh)
        suppress = ious[i] > thresh
        remaining = remaining & ~suppress
        remaining = remaining.at[i].set(False)
        return remaining, keep

    remaining = valid & (scores > neg_inf)
    keep = jnp.zeros((n,), bool)
    _, keep = jax.lax.while_loop(cond, body, (remaining, keep))
    return keep
