"""SimpleBaseline pose network: ResNet trunk + deconv head (NHWC flax).

Behavioral reference: AdvMix `lib/models/pose_resnet.py` (torchvision-style
ResNet-18/34/50/101/152 per `resnet_spec` at :252-258, three 256-channel
k4-s2 deconv layers, 1x1 final conv -> NUM_JOINTS heatmaps). Re-designed for
TPU: NHWC layout so convs tile onto the MXU, BN stats in `batch_stats`,
optional bfloat16 compute dtype.

Input: (B, H, W, 3); output: (B, H/4, W/4, NUM_JOINTS).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from .layers import batch_norm, conv, conv_transpose, max_pool_3x3_s2

RESNET_SPEC = {
    18: ("basic", (2, 2, 2, 2)),
    34: ("basic", (3, 4, 6, 3)),
    50: ("bottleneck", (3, 4, 6, 3)),
    101: ("bottleneck", (3, 4, 23, 3)),
    152: ("bottleneck", (3, 8, 36, 3)),
}


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    prefix: str = ""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        p = self.prefix
        residual = x
        out = conv(f"{p}conv1", self.planes, 3, self.stride, 1, dtype=self.dtype)(x)
        out = batch_norm(f"{p}bn1", train, self.dtype)(out)
        out = nn.relu(out)
        out = conv(f"{p}conv2", self.planes, 3, 1, 1, dtype=self.dtype)(out)
        out = batch_norm(f"{p}bn2", train, self.dtype)(out)
        if self.downsample:
            residual = conv(
                f"{p}downsample_0", self.planes, 1, self.stride, 0, dtype=self.dtype
            )(x)
            residual = batch_norm(f"{p}downsample_1", train, self.dtype)(residual)
        return nn.relu(out + residual)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    prefix: str = ""
    dtype: Any = jnp.float32
    expansion: int = 4

    @nn.compact
    def __call__(self, x, train: bool = True):
        p = self.prefix
        residual = x
        out = conv(f"{p}conv1", self.planes, 1, dtype=self.dtype)(x)
        out = batch_norm(f"{p}bn1", train, self.dtype)(out)
        out = nn.relu(out)
        out = conv(f"{p}conv2", self.planes, 3, self.stride, 1, dtype=self.dtype)(out)
        out = batch_norm(f"{p}bn2", train, self.dtype)(out)
        out = nn.relu(out)
        out = conv(f"{p}conv3", self.planes * 4, 1, dtype=self.dtype)(out)
        out = batch_norm(f"{p}bn3", train, self.dtype)(out)
        if self.downsample:
            residual = conv(
                f"{p}downsample_0", self.planes * 4, 1, self.stride, 0,
                dtype=self.dtype,
            )(x)
            residual = batch_norm(f"{p}downsample_1", train, self.dtype)(residual)
        return nn.relu(out + residual)


def make_res_layer(
    block_kind: str,
    planes: int,
    blocks: int,
    stride: int,
    in_features: int,
    prefix: str,
    dtype,
    use_scan: bool = False,
):
    """Build the callables for one ResNet stage.

    With use_scan, the identical tail blocks (everything after the first,
    possibly-downsampling block) run as one remat'd lax.scan body — the
    same compile-time/HBM treatment as scanned HRNet (pose_hrnet.py);
    essential for ResNet-101/152 whose unrolled backward graphs are
    compile-prohibitive on the axon TPU toolchain."""
    expansion = 4 if block_kind == "bottleneck" else 1
    cls = Bottleneck if block_kind == "bottleneck" else BasicBlock
    mods = []
    needs_ds = stride != 1 or in_features != planes * expansion
    mods.append(
        cls(
            planes=planes,
            stride=stride,
            downsample=needs_ds,
            prefix=f"{prefix}_0_",
            dtype=dtype,
            name=f"{prefix}_0",
        )
    )
    if use_scan and blocks > 2:
        from .pose_hrnet import _scan_blocks

        mods.append(_scan_blocks(cls, planes, blocks - 1,
                                 f"{prefix}_scan", dtype))
    else:
        for i in range(1, blocks):
            mods.append(
                cls(planes=planes, prefix=f"{prefix}_{i}_", dtype=dtype,
                    name=f"{prefix}_{i}")
            )
    return mods, planes * expansion


class PoseResNet(nn.Module):
    """ResNet trunk + deconv head.

    Attributes mirror cfg.MODEL.EXTRA keys of the reference
    (`lib/models/pose_resnet.py:105-134`).
    """

    num_layers: int = 50
    num_joints: int = 17
    num_deconv_layers: int = 3
    num_deconv_filters: Sequence[int] = (256, 256, 256)
    num_deconv_kernels: Sequence[int] = (4, 4, 4)
    final_conv_kernel: int = 1
    deconv_with_bias: bool = False
    dtype: Any = jnp.float32
    use_scan: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True):
        block_kind, layers = RESNET_SPEC[self.num_layers]
        x = x.astype(self.dtype)
        x = conv("conv1", 64, 7, 2, 3, dtype=self.dtype)(x)
        x = batch_norm("bn1", train, self.dtype)(x)
        x = nn.relu(x)
        x = max_pool_3x3_s2(x)

        in_feat = 64
        for li, (planes, blocks, stride) in enumerate(
            zip((64, 128, 256, 512), layers, (1, 2, 2, 2)), start=1
        ):
            mods, in_feat = make_res_layer(
                block_kind, planes, blocks, stride, in_feat, f"layer{li}",
                self.dtype, use_scan=self.use_scan,
            )
            for m in mods:
                x = m(x, train)

        # deconv head (kernel/padding combos per _get_deconv_cfg :153-164)
        for i in range(self.num_deconv_layers):
            k = self.num_deconv_kernels[i]
            padding = {4: 1, 3: 1, 2: 0}[k]
            output_padding = {4: 0, 3: 1, 2: 0}[k]
            x = conv_transpose(
                f"deconv_layers_{i * 3}",
                self.num_deconv_filters[i],
                k,
                2,
                padding,
                output_padding,
                use_bias=self.deconv_with_bias,
                dtype=self.dtype,
            )(x)
            x = batch_norm(f"deconv_layers_{i * 3 + 1}", train, self.dtype)(x)
            x = nn.relu(x)

        pad = 1 if self.final_conv_kernel == 3 else 0
        x = conv(
            "final_layer",
            self.num_joints,
            self.final_conv_kernel,
            1,
            pad,
            use_bias=True,
            dtype=self.dtype,
        )(x)
        return x.astype(jnp.promote_types(jnp.float32, self.dtype))


def get_pose_net(cfg, dtype=jnp.float32) -> PoseResNet:
    """Registry entry (`lib/models/pose_resnet.py:261`)."""
    extra = cfg.MODEL.EXTRA
    return PoseResNet(
        num_layers=extra.NUM_LAYERS,
        num_joints=cfg.MODEL.NUM_JOINTS,
        num_deconv_layers=extra.NUM_DECONV_LAYERS,
        num_deconv_filters=tuple(extra.NUM_DECONV_FILTERS),
        num_deconv_kernels=tuple(extra.NUM_DECONV_KERNELS),
        final_conv_kernel=extra.FINAL_CONV_KERNEL,
        deconv_with_bias=extra.DECONV_WITH_BIAS,
        dtype=dtype,
        use_scan=bool(extra.get("USE_SCAN", False)),
    )
