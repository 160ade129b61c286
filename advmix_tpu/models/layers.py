"""Shared flax building blocks (NHWC, TPU-first).

Conventions:
- All convs/norms carry explicit `name=`s mirroring the reference torch
  module paths (e.g. `layer1.0.conv1` -> name "layer1_0_conv1") so torch
  checkpoints convert by pure key mapping (see models/torch_convert.py).
- BatchNorm matches torch BN semantics: eps=1e-5, torch momentum 0.1 ==
  flax momentum 0.9; running stats live in the `batch_stats` collection.
- Compute dtype is a module attribute (`dtype`) so the whole model can run
  bfloat16 on the MXU while params stay float32.
"""

from __future__ import annotations

import contextlib

from typing import Any

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

BN_MOMENTUM_TORCH = 0.1  # reference BN_MOMENTUM (lib/models/pose_resnet.py:18)


class TorchBatchNorm(nn.Module):
    """BatchNorm with exact torch semantics.

    Differences from flax nn.BatchNorm: the running variance is updated with
    the *unbiased* batch variance (n/(n-1)) while normalization uses the
    biased one, matching torch.nn.BatchNorm2d. Stats are computed in float32
    regardless of compute dtype. Optional `axis_name` enables cross-replica
    stats (sync-BN) inside shard_map; left None it reproduces the reference's
    per-replica DataParallel behavior (SURVEY §7 hard part 4).
    """

    use_running_average: bool = False
    momentum: float = BN_MOMENTUM_TORCH
    epsilon: float = 1e-5
    dtype: Any = jnp.float32
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x):
        features = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (features,), jnp.float32)
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros(features, jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones(features, jnp.float32)
        )

        # stats dtype: at least f32 (bf16 compute upcasts — the production
        # contract), but f64 compute keeps f64 so the f64 loop differential
        # (tests/test_advmix_differential.py) isn't truncated through BN
        stats_dtype = jnp.promote_types(jnp.float32, jnp.asarray(x).dtype)
        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            xf = x.astype(stats_dtype)
            reduce_axes = tuple(range(x.ndim - 1))
            mean = jnp.mean(xf, axis=reduce_axes)
            mean2 = jnp.mean(jnp.square(xf), axis=reduce_axes)
            n = float(np.prod([x.shape[a] for a in reduce_axes]))
            if self.axis_name is not None:
                mean = jax.lax.pmean(mean, self.axis_name)
                mean2 = jax.lax.pmean(mean2, self.axis_name)
                n *= jax.lax.psum(1, self.axis_name)
            var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
            if not self.is_initializing():
                unbiased = var * (n / jnp.maximum(n - 1.0, 1.0))
                m = self.momentum
                ra_mean.value = (1 - m) * ra_mean.value + m * mean
                ra_var.value = (1 - m) * ra_var.value + m * unbiased

        y = (x.astype(stats_dtype) - mean) * jax.lax.rsqrt(
            var.astype(stats_dtype) + self.epsilon)
        y = y * scale + bias
        return y.astype(self.dtype)


_BN_AXIS_NAME: str | None = None


@contextlib.contextmanager
def cross_replica_bn(axis_name: str | None):
    """Trace-time context: every `batch_norm` constructed inside computes
    batch statistics across the named mesh axis (sync-BN,
    TRAIN.CROSS_REPLICA_BN). The step functions (engine/steps.py) wrap
    their bodies in this, so the flag flips behavior without threading an
    attribute through every block of three model families. Python-level
    state is safe here because flax module construction happens
    synchronously during tracing inside the `with` scope."""
    global _BN_AXIS_NAME
    old = _BN_AXIS_NAME
    _BN_AXIS_NAME = axis_name
    try:
        yield
    finally:
        _BN_AXIS_NAME = old


def batch_norm(
    name: str, train: bool, dtype=jnp.float32, axis_name: str | None = None
) -> TorchBatchNorm:
    return TorchBatchNorm(
        use_running_average=not train,
        dtype=dtype,
        axis_name=axis_name if axis_name is not None else _BN_AXIS_NAME,
        name=name,
    )


def conv(
    name: str,
    features: int,
    kernel: int,
    stride: int = 1,
    padding: int = 0,
    use_bias: bool = False,
    dtype=jnp.float32,
) -> nn.Conv:
    return nn.Conv(
        features=features,
        kernel_size=(kernel, kernel),
        strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        use_bias=use_bias,
        dtype=dtype,
        kernel_init=nn.initializers.normal(stddev=0.001),
        name=name,
    )


def conv_transpose(
    name: str,
    features: int,
    kernel: int = 4,
    stride: int = 2,
    padding: int = 1,
    output_padding: int = 0,
    use_bias: bool = False,
    dtype=jnp.float32,
) -> nn.ConvTranspose:
    """torch ConvTranspose2d-equivalent sizing.

    torch output = (in-1)*s - 2p + k + output_padding. lax.conv_transpose
    with explicit padding (k-1-p, k-1-p+output_padding) reproduces it.
    """
    lo = kernel - 1 - padding
    hi = kernel - 1 - padding + output_padding
    return nn.ConvTranspose(
        features=features,
        kernel_size=(kernel, kernel),
        strides=(stride, stride),
        padding=((lo, hi), (lo, hi)),
        use_bias=use_bias,
        dtype=dtype,
        kernel_init=nn.initializers.normal(stddev=0.001),
        transpose_kernel=True,  # matches torch's gradient-of-conv semantics
        name=name,
    )


def max_pool_3x3_s2(x: jnp.ndarray) -> jnp.ndarray:
    """torch MaxPool2d(kernel=3, stride=2, padding=1): pad with -inf."""
    return nn.max_pool(
        x, window_shape=(3, 3), strides=(2, 2), padding=((1, 1), (1, 1))
    )


def upsample_nearest(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    """Nearest-neighbor spatial upsampling (HRNet fuse layers)."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(
        x[:, :, None, :, None, :], (b, h, factor, w, factor, c)
    )
    return x.reshape(b, h * factor, w * factor, c)


def instance_norm(name: str, features: int, dtype=jnp.float32) -> nn.GroupNorm:
    """torch InstanceNorm2d(affine=False) == per-channel GroupNorm w/o affine."""
    return nn.GroupNorm(
        num_groups=features,
        use_bias=False,
        use_scale=False,
        epsilon=1e-5,
        dtype=dtype,
        name=name,
    )
