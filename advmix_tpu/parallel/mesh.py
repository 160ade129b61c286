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


def get_mesh(num_devices: Optional[int] = None, axis_name: str = "data") -> Mesh:
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.array(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis_name))


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
