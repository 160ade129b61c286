"""Official HigherHRNet torch-checkpoint import (VERDICT r2 missing #3).

Public HigherHRNet-W32 checkpoints use the `_make_deconv_layers` Sequential
nesting (`deconv_layers.<i>.0.{0,1}.*` for ConvT/BN and
`deconv_layers.<i>.<j>.0.<blockmod>.*` for BasicBlocks) plus
`final_layers.<i>.*` — this builds a tiny torch bottom-up net with exactly
that naming on top of the reference-named HRNet trunk from
test_hrnet_convert, and verifies torch_to_flax_variables maps EVERY key
and the flax HigherHRNet reproduces the torch outputs at both scales.
"""

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn as tnn

from advmix_tpu.models import torch_convert as TC
from advmix_tpu.models.higher_hrnet import HigherHRNet

from test_hrnet_convert import STAGES, CH, TBasic, THRNet, _bn

J = 5


class TTrunk(THRNet):
    """Reference-named HRNet trunk: THRNet minus its top-down head."""

    def __init__(self):
        super().__init__(num_joints=J)
        del self.final_layer

    def forward(self, x):
        x = torch.relu(self.bn1(self.conv1(x)))
        x = torch.relu(self.bn2(self.conv2(x)))
        x = self.layer1(x)
        xs = [self.transition1[0](x), self.transition1[1](x)]
        xs = self.stage2(xs)
        xs = [xs[0], xs[1], self.transition2[2](xs[-1])]
        xs = self.stage3(xs)
        xs = [xs[0], xs[1], xs[2], self.transition3[3](xs[-1])]
        xs = self.stage4(xs)
        return xs[0]


class THigher(tnn.Module):
    """Official pose_higher_hrnet.py layout: trunk keys at top level,
    deconv stage = Sequential(Sequential(ConvT, BN, ReLU),
    Sequential(BasicBlock) x4), final_layers ModuleList of 1x1 convs."""

    def __init__(self, filters=16, n_blocks=4):
        super().__init__()
        trunk = TTrunk()
        # official checkpoints store trunk modules at top level
        for name, mod in list(trunk.named_children()):
            self.add_module(name, mod)
        self._trunk_forward = TTrunk.forward
        cin = CH[0] + 2 * J  # feat + (heatmaps+tags) concat
        stage = [
            tnn.Sequential(
                tnn.ConvTranspose2d(cin, filters, 4, 2, 1, bias=False),
                _bn(filters),
                tnn.ReLU(True),
            )
        ]
        for _ in range(n_blocks):
            stage.append(tnn.Sequential(TBasic(filters, filters)))
        self.deconv_layers = tnn.ModuleList([tnn.Sequential(*stage)])
        self.final_layers = tnn.ModuleList(
            [tnn.Conv2d(CH[0], 2 * J, 1), tnn.Conv2d(filters, J, 1)]
        )

    def forward(self, x):
        feat = self._trunk_forward(self, x)
        outputs = [self.final_layers[0](feat)]
        h = torch.cat([feat, outputs[0]], dim=1)
        h = self.deconv_layers[0](h)
        outputs.append(self.final_layers[1](h))
        return outputs


def _randomize(t):
    for m in t.modules():
        if isinstance(m, tnn.BatchNorm2d):
            m.running_mean.data = torch.randn_like(m.running_mean) * 0.1
            m.running_var.data = torch.rand_like(m.running_var) + 0.5
        if isinstance(m, (tnn.Conv2d, tnn.ConvTranspose2d)):
            tnn.init.normal_(m.weight, std=0.05)


def test_official_higher_hrnet_import_full_parity():
    torch.manual_seed(0)
    t = THigher().eval()
    _randomize(t)

    model = HigherHRNet(
        num_joints=J,
        tag_per_joint=True,
        num_deconv_layers=1,
        num_deconv_filters=(16,),
        cat_output=(True,),
        num_basic_blocks=4,
        **STAGES,
    )
    x = torch.randn(2, 3, 64, 64)
    xj = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    v = model.init(jax.random.PRNGKey(0), xj, train=False)
    v2, report = TC.torch_to_flax_variables(
        t.state_dict(), dict(v), strict=True, return_report=True
    )
    n_torch = sum(
        1 for k in t.state_dict() if not k.endswith("num_batches_tracked")
    )
    assert report["matched"] == n_torch, (report["matched"], n_torch)
    assert not report["misses"]

    outs = model.apply(v2, xj, train=False)
    refs = [o.detach().numpy() for o in t(x)]
    for got, ref in zip(outs, refs):
        np.testing.assert_allclose(
            np.asarray(got).transpose(0, 3, 1, 2), ref, atol=5e-4
        )


def test_official_import_via_load_torch_checkpoint(tmp_path):
    """TEST.MODEL_FILE / --load_from_D path: every official key loads
    through engine.checkpoint.load_torch_checkpoint (no silent random
    init for the bottom-up family)."""
    from advmix_tpu.engine.checkpoint import load_torch_checkpoint

    torch.manual_seed(1)
    t = THigher().eval()
    _randomize(t)
    pth = str(tmp_path / "higher.pth")
    torch.save({"state_dict": t.state_dict()}, pth)

    model = HigherHRNet(
        num_joints=J, tag_per_joint=True, num_deconv_layers=1,
        num_deconv_filters=(16,), cat_output=(True,), num_basic_blocks=4,
        **STAGES,
    )
    x = torch.randn(1, 3, 64, 64)
    xj = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    v = model.init(jax.random.PRNGKey(0), xj, train=False)
    loaded = load_torch_checkpoint(pth, dict(v))
    outs = model.apply(loaded, xj, train=False)
    refs = [o.detach().numpy() for o in t(x)]
    for got, ref in zip(outs, refs):
        np.testing.assert_allclose(
            np.asarray(got).transpose(0, 3, 1, 2), ref, atol=5e-4
        )


def test_topdown_resnet_deconv_keys_unaffected():
    """PoseResNet's flat `deconv_layers.<k>.*` keys must pass through the
    bottom-up remap untouched."""
    sd = {
        "deconv_layers.0.weight": 1,
        "deconv_layers.1.weight": 2,
        "deconv_layers.1.running_mean": 3,
        "final_layer.weight": 4,
    }
    assert TC.remap_official_higher_hrnet_keys(sd) == sd
