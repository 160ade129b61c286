from .mesh import get_mesh, batch_sharding, replicated_sharding, device_put_batch

__all__ = [
    "get_mesh",
    "batch_sharding",
    "replicated_sharding",
    "device_put_batch",
]
