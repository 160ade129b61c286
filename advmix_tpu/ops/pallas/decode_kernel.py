"""Pallas TPU kernel: fused heatmap decode (argmax + quarter-pixel offset).

North-star item (SURVEY §7.5): the reference decodes on host numpy per batch
(`lib/core/inference.py:22-95`); here one kernel invocation per batch grid
cell finds every joint's peak, applies the POST_PROCESS quarter-offset
toward the larger neighbor, and emits (x, y, maxval) — no host round-trip
and no extra HBM traffic for intermediate argmax tensors.

Layouts obey TPU tiling rules: the input block is (1, J, H, W) so the last
two dims equal the full array dims; the output is (B, 3, J) with a
(1, 3, J) block.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _decode_kernel(hm_ref, out_ref, *, h, w, num_joints, post_process):
    rows = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    flat = rows * w + cols

    xs_out, ys_out, ms_out = [], [], []
    for j in range(num_joints):
        hm = hm_ref[0, j, :, :]  # (H, W)
        m = jnp.max(hm)
        # first (row-major) peak index, matching np.argmax tie-breaking
        idx = jnp.min(jnp.where(hm == m, flat, h * w))
        py = idx // w
        px = idx % w

        x = px.astype(jnp.float32)
        y = py.astype(jnp.float32)

        if post_process:
            inside = (px > 1) & (px < w - 1) & (py > 1) & (py < h - 1)
            pxc = jnp.clip(px, 1, w - 2)
            pyc = jnp.clip(py, 1, h - 2)

            # dynamic_slice on values is not lowerable in Pallas TPU;
            # read the 4 neighbors with masked reductions on the VPU
            def at(yy, xx):
                mask = (rows == yy) & (cols == xx)
                return jnp.sum(jnp.where(mask, hm, 0.0))

            dx = at(pyc, pxc + 1) - at(pyc, pxc - 1)
            dy = at(pyc + 1, pxc) - at(pyc - 1, pxc)
            x = x + jnp.where(inside, jnp.sign(dx) * 0.25, 0.0)
            y = y + jnp.where(inside, jnp.sign(dy) * 0.25, 0.0)

        # zero coords where the peak value is not positive
        # (get_max_preds semantics, lib/core/inference.py:45-48)
        valid = m > 0.0
        xs_out.append(jnp.where(valid, x, 0.0))
        ys_out.append(jnp.where(valid, y, 0.0))
        ms_out.append(m)

    # single full-block store (scalar VMEM stores are not lowerable)
    out_ref[0, :, :] = jnp.stack(
        [jnp.stack(xs_out), jnp.stack(ys_out), jnp.stack(ms_out)]
    )


@functools.partial(
    jax.jit, static_argnames=("post_process", "interpret")
)
def decode_heatmaps_pallas(
    heatmaps: jnp.ndarray,  # (B, H, W, J)
    post_process: bool = True,
    interpret: bool = False,
):
    """Returns coords (B, J, 2) in heatmap space and maxvals (B, J, 1)."""
    b, h, w, j = heatmaps.shape
    hm = heatmaps.astype(jnp.float32).transpose(0, 3, 1, 2)  # (B, J, H, W)
    out = pl.pallas_call(
        functools.partial(
            _decode_kernel, h=h, w=w, num_joints=j, post_process=post_process
        ),
        out_shape=jax.ShapeDtypeStruct((b, 3, j), jnp.float32),
        grid=(b,),
        in_specs=[
            pl.BlockSpec(
                (1, j, h, w), lambda bi: (bi, 0, 0, 0),
                memory_space=pltpu.VMEM,
            )
        ],
        out_specs=pl.BlockSpec(
            (1, 3, j), lambda bi: (bi, 0, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(hm)
    coords = out[:, :2, :].transpose(0, 2, 1)  # (B, J, 2)
    maxvals = out[:, 2:3, :].transpose(0, 2, 1)  # (B, J, 1)
    return coords, maxvals
