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
