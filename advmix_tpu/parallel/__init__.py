from .mesh import get_mesh, batch_sharding, replicated_sharding, device_put_batch
from .spatial import make_spatial_forward, spatial_sharding

__all__ = [
    "get_mesh",
    "batch_sharding",
    "replicated_sharding",
    "device_put_batch",
    "make_spatial_forward",
    "spatial_sharding",
]
