"""HRNet pose network (W32/W48) in NHWC flax.

Behavioral reference: AdvMix `lib/models/pose_hrnet.py:101-500` — stem of two
stride-2 3x3 convs, a 4-Bottleneck layer1, then three configured stages of
`HighResolutionModule`s (parallel multi-resolution branches with full
pairwise fusion: 1x1 conv + nearest-upsample for coarser->finer, chains of
stride-2 3x3 convs for finer->coarser), final 1x1 conv on the highest-res
branch.

TPU-first: NHWC; all branch/fuse convs are static-shape so XLA fuses the
elementwise adds into the convs; module names mirror torch key paths for
checkpoint conversion.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from .layers import batch_norm, conv, upsample_nearest
from .pose_resnet import BasicBlock, Bottleneck

BLOCK_EXPANSION = {"BASIC": 1, "BOTTLENECK": 4}
BLOCK_CLS = {"BASIC": BasicBlock, "BOTTLENECK": Bottleneck}


def _remat_mode(remat) -> str:
    if remat is True:
        return "nested"
    if remat is False:
        return "none"
    return str(remat)


def _scan_blocks(cls, planes, n, name, dtype, remat=True):
    """Scan n identical (stride-1, no-downsample) residual blocks.

    Stacks the n blocks' params on a leading axis and runs them as one
    lax.scan body — the traced/compiled graph contains ONE block instead of
    n. Numerics are identical to the unrolled loop; only the param pytree
    layout differs (see torch_convert.stack_for_scan)."""

    class Body(nn.Module):
        @nn.compact
        def __call__(self, carry, train):
            out = cls(
                planes=planes, stride=1, downsample=False, prefix="block_",
                dtype=dtype, name="block",
            )(carry, train)
            return out, None

    # remat trade-off on v5e (AdvMix-W32 bench): nested-remat recompute
    # costs ~2 extra D forwards of HBM traffic per step; storing the scan
    # activation stacks costs their write+read. REMAT=false wins when the
    # batch fits HBM (the step is bandwidth-bound); MODEL.EXTRA.REMAT
    # selects (default false).
    body = nn.remat(Body, static_argnums=(2,)) if remat else Body
    scanned = nn.scan(
        body,
        variable_axes={"params": 0, "batch_stats": 0},
        split_rngs={"params": True},
        in_axes=(nn.broadcast,),
        length=n,
    )

    def run(x, train):
        carry, _ = scanned(name=name)(x, train)
        return carry

    return run


def _scan_hr_modules(n, name, dtype, use_scan, remat=True,
                     block_remat="nested", **mod_kwargs):
    """Scan n identical HighResolutionModules (a whole stage prefix)."""

    class Body(nn.Module):
        @nn.compact
        def __call__(self, carry, train):
            out = HighResolutionModule(
                prefix="mod", dtype=dtype, use_scan=use_scan, name="mod",
                remat=block_remat, **mod_kwargs,
            )(list(carry), train)
            return tuple(out), None

    body = nn.remat(Body, static_argnums=(2,)) if remat else Body
    scanned = nn.scan(
        body,
        variable_axes={"params": 0, "batch_stats": 0},
        split_rngs={"params": True},
        in_axes=(nn.broadcast,),
        length=n,
    )

    def run(xs, train):
        carry, _ = scanned(name=name)(tuple(xs), train)
        return list(carry)

    return run


class HighResolutionModule(nn.Module):
    """One multi-branch module with pairwise fusion.

    `prefix` mirrors the torch path, e.g. "stage2_0".
    """

    num_branches: int
    block: str
    num_blocks: Sequence[int]
    num_inchannels: Sequence[int]  # per-branch input channels
    num_channels: Sequence[int]  # per-branch block width (pre-expansion)
    multi_scale_output: bool = True
    prefix: str = ""
    dtype: Any = jnp.float32
    use_scan: bool = False
    remat: Any = "nested"

    @nn.compact
    def __call__(self, xs, train: bool = True):
        p = self.prefix
        cls = BLOCK_CLS[self.block]
        exp = BLOCK_EXPANSION[self.block]
        out_channels = [c * exp for c in self.num_channels]

        # branches
        ys = []
        for i in range(self.num_branches):
            x = xs[i]
            needs_ds = self.num_inchannels[i] != out_channels[i]
            nb = self.num_blocks[i]
            if self.use_scan and not needs_ds and nb > 1:
                # identical residual blocks -> one scanned body: shrinks
                # the traced graph (and compile time) by ~nb x
                x = _scan_blocks(
                    cls, self.num_channels[i], nb,
                    f"{p}_branches_{i}_scan", self.dtype,
                    remat=_remat_mode(self.remat) in ("nested", "block"),
                )(x, train)
            else:
                for b in range(nb):
                    bp = f"{p}_branches_{i}_{b}"
                    x = cls(
                        planes=self.num_channels[i],
                        stride=1,
                        downsample=(b == 0 and needs_ds),
                        prefix=bp + "_",
                        dtype=self.dtype,
                        name=bp,
                    )(x, train)
            ys.append(x)

        if self.num_branches == 1:
            return ys

        # fuse
        n_out = self.num_branches if self.multi_scale_output else 1
        fused = []
        for i in range(n_out):
            acc = None
            for j in range(self.num_branches):
                fp = f"{p}_fuse_layers_{i}_{j}"
                if j == i:
                    v = ys[j]
                elif j > i:
                    v = conv(f"{fp}_0", out_channels[i], 1, dtype=self.dtype)(ys[j])
                    v = batch_norm(f"{fp}_1", train, self.dtype)(v)
                    v = upsample_nearest(v, 2 ** (j - i))
                else:  # j < i: chain of stride-2 3x3 convs
                    v = ys[j]
                    for k in range(i - j):
                        last = k == i - j - 1
                        ch = out_channels[i] if last else out_channels[j]
                        v = conv(f"{fp}_{k}_0", ch, 3, 2, 1, dtype=self.dtype)(v)
                        v = batch_norm(f"{fp}_{k}_1", train, self.dtype)(v)
                        if not last:
                            v = nn.relu(v)
                acc = v if acc is None else acc + v
            fused.append(nn.relu(acc))
        return fused


class PoseHighResolutionNet(nn.Module):
    """Full HRNet. Stage configs are the reference's MODEL.EXTRA dicts."""

    stage2_cfg: dict
    stage3_cfg: dict
    stage4_cfg: dict
    num_joints: int = 17
    final_conv_kernel: int = 1
    dtype: Any = jnp.float32
    use_scan: bool = False  # scan identical modules/blocks: ~4x smaller HLO
    # MODEL.EXTRA.REMAT: which scan level rematerializes in the backward.
    # "nested" (= True) remats BOTH the module scan and the block scans --
    # lowest memory, ~2 extra forward recomputes of HBM traffic per
    # backward. "module" remats only the module scan (1 recompute, tiny
    # carry storage). "block" remats only block scans. "none" (= False)
    # stores everything (OOMs at batch 128 on 16G v5e).
    remat: Any = "nested"

    def _stem_and_stages(self, x, train: bool):
        x = x.astype(self.dtype)
        # stem
        x = conv("conv1", 64, 3, 2, 1, dtype=self.dtype)(x)
        x = batch_norm("bn1", train, self.dtype)(x)
        x = nn.relu(x)
        x = conv("conv2", 64, 3, 2, 1, dtype=self.dtype)(x)
        x = batch_norm("bn2", train, self.dtype)(x)
        x = nn.relu(x)

        # layer1: 4 Bottlenecks at 64 planes (in 64 -> out 256)
        for b in range(4):
            bp = f"layer1_{b}"
            x = Bottleneck(
                planes=64,
                stride=1,
                downsample=(b == 0),
                prefix=bp + "_",
                dtype=self.dtype,
                name=bp,
            )(x, train)

        pre_channels = [256]
        xs = [x]
        for si, scfg in ((2, self.stage2_cfg), (3, self.stage3_cfg), (4, self.stage4_cfg)):
            exp = BLOCK_EXPANSION[scfg["BLOCK"]]
            cur_channels = [c * exp for c in scfg["NUM_CHANNELS"]]
            xs = self._transition(
                f"transition{si - 1}", xs, pre_channels, cur_channels, train
            )
            last_stage = si == 4
            n_mod = scfg["NUM_MODULES"]
            n_same = n_mod - (1 if last_stage else 0)
            mod_kwargs = dict(
                num_branches=scfg["NUM_BRANCHES"],
                block=scfg["BLOCK"],
                num_blocks=tuple(scfg["NUM_BLOCKS"]),
                num_inchannels=tuple(cur_channels),
                num_channels=tuple(scfg["NUM_CHANNELS"]),
            )
            start = 0
            if self.use_scan and n_same > 1:
                xs = _scan_hr_modules(
                    n_same, f"stage{si}_scan", self.dtype, True,
                    remat=_remat_mode(self.remat) in ("nested", "module"),
                    block_remat=self.remat,
                    multi_scale_output=True, **mod_kwargs,
                )(xs, train)
                start = n_same
            for m in range(start, n_mod):
                multi_out = not (last_stage and m == n_mod - 1)
                xs = HighResolutionModule(
                    multi_scale_output=multi_out,
                    prefix=f"stage{si}_{m}",
                    dtype=self.dtype,
                    use_scan=self.use_scan,
                    remat=self.remat,
                    name=f"stage{si}_{m}",
                    **mod_kwargs,
                )(xs, train)
            pre_channels = cur_channels
        return xs

    @nn.compact
    def __call__(self, x, train: bool = True):
        xs = self._stem_and_stages(x, train)

        pad = 1 if self.final_conv_kernel == 3 else 0
        out = conv(
            "final_layer",
            self.num_joints,
            self.final_conv_kernel,
            1,
            pad,
            use_bias=True,
            dtype=self.dtype,
        )(xs[0])
        return out.astype(jnp.promote_types(jnp.float32, self.dtype))

    def _transition(self, tname, xs, pre_channels, cur_channels, train):
        """Grow/reshape branches between stages
        (`lib/models/pose_hrnet.py:333-372`)."""
        n_pre = len(pre_channels)
        n_cur = len(cur_channels)
        outs = []
        for i in range(n_cur):
            if i < n_pre:
                if cur_channels[i] != pre_channels[i]:
                    v = conv(
                        f"{tname}_{i}_0", cur_channels[i], 3, 1, 1, dtype=self.dtype
                    )(xs[i])
                    v = batch_norm(f"{tname}_{i}_1", train, self.dtype)(v)
                    outs.append(nn.relu(v))
                else:
                    outs.append(xs[i])
            else:
                v = xs[-1]
                for j in range(i + 1 - n_pre):
                    ch = cur_channels[i] if j == i - n_pre else pre_channels[-1]
                    v = conv(
                        f"{tname}_{i}_{j}_0", ch, 3, 2, 1, dtype=self.dtype
                    )(v)
                    v = batch_norm(f"{tname}_{i}_{j}_1", train, self.dtype)(v)
                    v = nn.relu(v)
                outs.append(v)
        return outs


def get_pose_net(cfg, dtype=jnp.float32) -> PoseHighResolutionNet:
    """Registry entry (`lib/models/pose_hrnet.py:495`).

    MODEL.EXTRA.USE_SCAN (TPU-native extension) enables the scanned
    construction: identical stage modules / branch blocks become lax.scan
    bodies, shrinking the compiled graph ~4x (same numerics, different
    param pytree layout; torch checkpoints load through
    torch_convert.unstack_from_scan/stack_for_scan automatically).
    """
    extra = cfg.MODEL.EXTRA
    return PoseHighResolutionNet(
        stage2_cfg=dict(extra.STAGE2),
        stage3_cfg=dict(extra.STAGE3),
        stage4_cfg=dict(extra.STAGE4),
        num_joints=cfg.MODEL.NUM_JOINTS,
        final_conv_kernel=extra.FINAL_CONV_KERNEL,
        dtype=dtype,
        use_scan=bool(extra.get("USE_SCAN", False)),
        remat=extra.get("REMAT", "nested"),
    )
