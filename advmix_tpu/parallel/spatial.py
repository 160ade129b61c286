"""GSPMD spatial partitioning — intra-image model parallelism.

The reference's only parallelism is DataParallel over the batch axis
(`/root/reference/tools/train.py:106`): one GPU sees whole images, so
its minimum working batch is one image per device and its maximum image
area is one device's memory. On TPU, XLA's SPMD partitioner can shard
the *height* dimension of an NHWC conv network across a mesh axis and
insert the halo exchanges (`CollectivePermute` of kernel-overlap rows)
each convolution needs at shard boundaries — parallelism inside a
single image that DataParallel cannot express.

This matters for the bottom-up family: HigherHRNet evaluates full
scenes at 512x512 and up (multi-scale sweeps go larger still), where a
single huge image per step leaves a data-only mesh idle. With a
(data, model) mesh from `get_mesh(model_parallel=k)`, a batch of B
images runs B/d x-wide data-parallel while each image's rows split k
ways — latency for a single large image drops with k instead of being
pinned to one chip.

Nothing here hand-schedules the halos: we annotate shardings on a
plain `jax.jit` of `model.apply` and let the partitioner place the
collectives on ICI. (The training path keeps its explicit `shard_map`
data-parallel step — gradient semantics there are deliberately
hand-written; spatial partitioning is an inference/serving feature.)
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def spatial_sharding(mesh: Mesh, data_axis: str = "data",
                     spatial_axis: str = "model") -> NamedSharding:
    """(B, H, W, C) images: batch over the data axis, rows over the
    model axis."""
    return NamedSharding(mesh, P(data_axis, spatial_axis))


def make_spatial_forward(model: Any, mesh: Mesh, *,
                         data_axis: str = "data",
                         spatial_axis: str = "model",
                         train: bool = False):
    """jit `model.apply` with images sharded (B, H) over the mesh and
    params replicated; returns `fn(variables, images)`.

    Output shardings are left to the partitioner (heads may change
    resolution or return pytrees — e.g. HigherHRNet's two-scale list);
    fetch with `jax.device_get` or constrain downstream as needed.
    Height need not divide evenly — GSPMD pads internally — but even
    shards avoid wasted rows.
    """
    assert spatial_axis in mesh.axis_names, (spatial_axis, mesh.axis_names)
    img_sh = spatial_sharding(mesh, data_axis, spatial_axis)
    rep = NamedSharding(mesh, P())

    def fwd(variables, x):
        return model.apply(variables, x, train=train)

    return jax.jit(fwd, in_shardings=(rep, img_sh))
