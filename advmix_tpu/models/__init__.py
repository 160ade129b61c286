"""Model registry.

The reference resolves architectures by name via
`eval('models.'+cfg.MODEL.NAME+'.get_pose_net')` (`tools/train.py:60`); we
use an explicit registry instead.
"""

from . import pose_resnet, pose_hrnet, unet, higher_hrnet

_REGISTRY = {
    "pose_resnet": pose_resnet.get_pose_net,
    "pose_hrnet": pose_hrnet.get_pose_net,
    "pose_higher_hrnet": higher_hrnet.get_pose_net,
}


def get_pose_net(cfg, dtype=None):
    import jax.numpy as jnp

    name = cfg.MODEL.NAME
    if name not in _REGISTRY:
        raise KeyError(f"unknown model '{name}'; available: {list(_REGISTRY)}")
    kwargs = {}
    if dtype is not None:
        kwargs["dtype"] = dtype
    return _REGISTRY[name](cfg, **kwargs)


def register(name, fn):
    _REGISTRY[name] = fn


def he_reinit_convs(params, key):
    """He-normal re-initialization of all 4-D conv kernels.

    The reference's normal(0.001) init (`lib/models/pose_hrnet.py:462`)
    assumes ImageNet-pretrained trunks and is pathological from scratch;
    MODEL.EXTRA.HE_INIT opts synthetic/from-scratch runs into this
    (tools/train.py). The faithful init stays the default."""
    import flax
    import jax
    import numpy as np

    flat = flax.traverse_util.flatten_dict(params)
    for path, leaf in sorted(flat.items()):
        if path[-1] == "kernel" and getattr(leaf, "ndim", 0) == 4:
            key, sub = jax.random.split(key)
            fan_in = leaf.shape[0] * leaf.shape[1] * leaf.shape[2]
            flat[path] = (
                jax.random.normal(sub, leaf.shape, leaf.dtype)
                * np.sqrt(2.0 / fan_in)
            )
    return flax.traverse_util.unflatten_dict(flat)


from .unet import UnetGenerator, get_generator  # noqa: E402

__all__ = [
    "get_pose_net",
    "register",
    "UnetGenerator",
    "get_generator",
    "pose_resnet",
    "pose_hrnet",
    "unet",
]
