"""UNet mixing-weight generator (AdvMix "G") in NHWC flax.

Behavioral reference: AdvMix `lib/models/Unet_generator.py:13-112` — a
recursive skip-connection UNet with InstanceNorm (no affine), LeakyReLU(0.2)
down / ReLU up, k4-s2-p1 convs, constructed as
UnetGenerator(input_nc=9, output_nc=3, num_downs=6, ngf=64) at
`tools/train.py:67`. The recursion is flattened here into an explicit
encoder/decoder loop (identical dataflow); the output is 3 per-pixel mixing
logits over the K=3 views, softmaxed in the train step
(`lib/core/function.py:138`).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from .layers import conv, conv_transpose, instance_norm


class UnetGenerator(nn.Module):
    input_nc: int = 9
    output_nc: int = 3
    num_downs: int = 6
    ngf: int = 64
    with_tanh: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        n = self.num_downs
        filters = [self.ngf * min(2**i, 8) for i in range(n)]
        x = x.astype(self.dtype)

        # Encoder. InstanceNorm implies use_bias=True on all convs
        # (`lib/models/Unet_generator.py:34-37`).
        downs = []
        h = x
        for i in range(n):
            if i > 0:
                h = nn.leaky_relu(h, negative_slope=0.2)
            h = conv(
                f"down_{i}_conv", filters[i], 4, 2, 1, use_bias=True,
                dtype=self.dtype,
            )(h)
            if 0 < i < n - 1:
                h = instance_norm(f"down_{i}_norm", filters[i], self.dtype)(h)
            downs.append(h)

        # Decoder with skip concats (channel axis = -1 in NHWC).
        u = nn.relu(downs[n - 1])
        u = conv_transpose(
            f"up_{n - 1}_conv", filters[n - 2], 4, 2, 1, use_bias=True,
            dtype=self.dtype,
        )(u)
        u = instance_norm(f"up_{n - 1}_norm", filters[n - 2], self.dtype)(u)

        for i in range(n - 2, 0, -1):
            u = jnp.concatenate([downs[i], u], axis=-1)
            u = nn.relu(u)
            u = conv_transpose(
                f"up_{i}_conv", filters[i - 1], 4, 2, 1, use_bias=True,
                dtype=self.dtype,
            )(u)
            u = instance_norm(f"up_{i}_norm", filters[i - 1], self.dtype)(u)

        u = jnp.concatenate([downs[0], u], axis=-1)
        u = nn.relu(u)
        u = conv_transpose(
            "up_0_conv", self.output_nc, 4, 2, 1, use_bias=True,
            dtype=self.dtype,
        )(u)
        if self.with_tanh:
            u = jnp.tanh(u)
        return u.astype(jnp.promote_types(jnp.float32, self.dtype))


def get_generator(args=None, dtype=jnp.float32) -> UnetGenerator:
    """Build G with the reference CLI defaults
    (`tools/_init_parse.py:117-131`: gen_input_chn=9, downsamples=6)."""
    input_nc = getattr(args, "gen_input_chn", 9) if args else 9
    num_downs = getattr(args, "downsamples", 6) if args else 6
    return UnetGenerator(input_nc=input_nc, num_downs=num_downs, dtype=dtype)
