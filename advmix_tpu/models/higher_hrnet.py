"""HigherHRNet bottom-up pose network (W32), NHWC flax.

The reference repo publishes HigherHRNet numbers (README rows, SURVEY §6)
but contains no bottom-up model code — only a vestigial
`cfg.model.type == 'BottomUp'` branch (`tools/test_corruption.py:147`).
This implementation follows the public HigherHRNet spec (Cheng et al.,
CVPR 2020): an HRNet trunk producing the 1/4-resolution feature map, a
first 1x1 head emitting heatmaps + associative-embedding tagmaps at 1/4,
then a deconv module (ConvTranspose k4 s2 on the concat of features and
the 1/4 predictions, followed by 4 BasicBlocks) and a second 1x1 head
emitting heatmaps at 1/2 resolution.

Outputs (train): list of two NHWC maps
  [ (B, H/4, W/4, 2*J)  — heatmaps[..., :J] + tags[..., J:],
    (B, H/2, W/2, J)    — heatmaps only ]
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from .layers import batch_norm, conv, conv_transpose
from .pose_hrnet import PoseHighResolutionNet
from .pose_resnet import BasicBlock


class HRNetTrunk(PoseHighResolutionNet):
    """HRNet without the final 1x1 head: returns the high-res feature map."""

    @nn.compact
    def __call__(self, x, train: bool = True):
        return self._stem_and_stages(x, train)[0]


class HigherHRNet(nn.Module):
    stage2_cfg: dict
    stage3_cfg: dict
    stage4_cfg: dict
    num_joints: int = 17
    tag_per_joint: bool = True
    num_deconv_layers: int = 1
    num_deconv_filters: Sequence[int] = (32,)
    cat_output: Sequence[bool] = (True,)
    num_basic_blocks: int = 4
    dtype: Any = jnp.float32
    use_scan: bool = False
    remat: Any = "nested"

    @nn.compact
    def __call__(self, x, train: bool = True):
        feat = HRNetTrunk(
            stage2_cfg=self.stage2_cfg,
            stage3_cfg=self.stage3_cfg,
            stage4_cfg=self.stage4_cfg,
            num_joints=self.num_joints,
            dtype=self.dtype,
            use_scan=self.use_scan,
            remat=self.remat,
            name="trunk",
        )(x, train)

        tag_ch = self.num_joints if self.tag_per_joint else 1
        outputs = []
        # head 0: heatmaps + tags at 1/4
        out0 = conv(
            "final_layers_0", self.num_joints + tag_ch, 1, 1, 0,
            use_bias=True, dtype=self.dtype,
        )(feat)
        outputs.append(out0.astype(jnp.promote_types(jnp.float32, self.dtype)))

        h = feat
        for i in range(self.num_deconv_layers):
            if self.cat_output[i]:
                h = jnp.concatenate([h, outputs[-1].astype(self.dtype)],
                                    axis=-1)
            filters = self.num_deconv_filters[i]
            h = conv_transpose(
                f"deconv_layers_{i}_deconv", filters, 4, 2, 1,
                use_bias=False, dtype=self.dtype,
            )(h)
            h = batch_norm(f"deconv_layers_{i}_bn", train, self.dtype)(h)
            h = nn.relu(h)
            for b in range(self.num_basic_blocks):
                bp = f"deconv_layers_{i}_block_{b}"
                h = BasicBlock(
                    planes=filters, stride=1, downsample=False,
                    prefix=bp + "_", dtype=self.dtype, name=bp,
                )(h, train)
            out_i = conv(
                f"final_layers_{i + 1}", self.num_joints, 1, 1, 0,
                use_bias=True, dtype=self.dtype,
            )(h)
            outputs.append(out_i.astype(jnp.promote_types(jnp.float32, self.dtype)))
        return outputs


def get_pose_net(cfg, dtype=jnp.float32) -> HigherHRNet:
    extra = cfg.MODEL.EXTRA
    deconv = extra.get("DECONV", {})
    return HigherHRNet(
        stage2_cfg=dict(extra.STAGE2),
        stage3_cfg=dict(extra.STAGE3),
        stage4_cfg=dict(extra.STAGE4),
        num_joints=cfg.MODEL.NUM_JOINTS,
        tag_per_joint=cfg.MODEL.TAG_PER_JOINT,
        num_deconv_layers=deconv.get("NUM_DECONVS", 1),
        num_deconv_filters=tuple(deconv.get("NUM_CHANNELS", [32])),
        cat_output=tuple(deconv.get("CAT_OUTPUT", [True])),
        num_basic_blocks=extra.get("NUM_BASIC_BLOCKS", 4),
        dtype=dtype,
        use_scan=bool(extra.get("USE_SCAN", False)),
        remat=extra.get("REMAT", "nested"),
    )
