"""Device mesh and sharding helpers.

The reference's only parallelism is single-process data parallelism via
torch DataParallel (`tools/train.py:106`, SURVEY §2). The TPU-native
equivalent is a 1-D "data" mesh over ICI: batches sharded on the leading
axis, params replicated, gradient reduction via `jax.lax.pmean` inside
`shard_map` (engine/steps.py). The mesh abstraction leaves room for extra
axes (e.g. a future multi-slice "dcn" axis) without touching the step code.
"""

from __future__ import annotations

from typing import Any, Optional

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def get_mesh(num_devices: Optional[int] = None, axis_name: str = "data",
             num_slices: Optional[int] = None,
             model_parallel: Optional[int] = None) -> Mesh:
    """1-D data mesh by default; `num_slices` > 1 builds a 2-D
    ("dcn", axis_name) mesh for multi-slice pods — batches shard over
    BOTH axes (pure DP) but the explicit hierarchy lets XLA schedule
    gradient reductions as intra-slice ICI psums followed by the slower
    cross-slice DCN hop instead of one flat ring.

    `model_parallel` > 1 builds a 2-D (axis_name, "model") mesh for
    GSPMD spatial partitioning (parallel/spatial.py): batches shard
    over axis_name, each image's height over "model". Mutually
    exclusive with num_slices (a 3-D variant has no workload here)."""
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    n = len(devices)
    if model_parallel and model_parallel > 1:
        assert not (num_slices and num_slices > 1), \
            "num_slices and model_parallel are mutually exclusive"
        assert n % model_parallel == 0, (n, model_parallel)
        arr = np.array(devices).reshape(n // model_parallel, model_parallel)
        return Mesh(arr, (axis_name, "model"))
    if num_slices and num_slices > 1:
        assert n % num_slices == 0, (n, num_slices)
        arr = np.array(devices).reshape(num_slices, n // num_slices)
        return Mesh(arr, ("dcn", axis_name))
    return Mesh(np.array(devices), (axis_name,))


def data_axes(mesh: Mesh, axis_name: str = "data"):
    """The axis names a batch shards over / gradients reduce over:
    (axis_name,) on a 1-D mesh, ("dcn", axis_name) on a multi-slice
    mesh."""
    if "dcn" in mesh.axis_names:
        return ("dcn", axis_name)
    return (axis_name,)


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(data_axes(mesh, axis_name)))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def device_put_batch(batch: Any, mesh: Mesh, axis_name: str = "data") -> Any:
    """Shard every leaf of a batch pytree along its leading axis.

    Single-process: a plain device_put against the batch sharding.
    Multi-host (jax.process_count() > 1): each process holds its LOCAL
    slice of the global batch (Loader(num_shards=process_count,
    shard_index=process_index)); leaves assemble into global arrays via
    jax.make_array_from_process_local_data (SURVEY §5 distributed-comm
    note). Data stays on the local hosts' chips; no DCN transfer."""
    sh = batch_sharding(mesh, axis_name)
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                sh, np.asarray(x)
            ),
            batch,
        )
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    sh = replicated_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)
