"""HRNet torch-checkpoint conversion parity.

Builds a tiny torch HRNet with the reference's exact module naming
(conv1/bn1/conv2/bn2, layer1.N, transitionK.i[.j].{0,1}, stageS.M.branches.
i.b.{conv1,bn1,...}, stageS.M.fuse_layers.i.j[.k].{0,1}, final_layer) and
verifies torch_to_flax_variables maps every key and the flax model
reproduces the torch outputs — the path real pretrained HRNet-W32/W48
checkpoints take.
"""

import pytest
import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn as tnn

from advmix_tpu.models import torch_convert as TC
from advmix_tpu.models.pose_hrnet import PoseHighResolutionNet

STAGES = dict(
    stage2_cfg=dict(NUM_MODULES=1, NUM_BRANCHES=2, BLOCK="BASIC",
                    NUM_BLOCKS=[2, 2], NUM_CHANNELS=[8, 16],
                    FUSE_METHOD="SUM"),
    stage3_cfg=dict(NUM_MODULES=2, NUM_BRANCHES=3, BLOCK="BASIC",
                    NUM_BLOCKS=[2, 2, 2], NUM_CHANNELS=[8, 16, 32],
                    FUSE_METHOD="SUM"),
    stage4_cfg=dict(NUM_MODULES=1, NUM_BRANCHES=4, BLOCK="BASIC",
                    NUM_BLOCKS=[2, 2, 2, 2], NUM_CHANNELS=[8, 16, 32, 64],
                    FUSE_METHOD="SUM"),
)
CH = [8, 16, 32, 64]


def _bn(c):
    return tnn.BatchNorm2d(c, momentum=0.1)


class TBasic(tnn.Module):
    def __init__(self, cin, c):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, c, 3, 1, 1, bias=False)
        self.bn1 = _bn(c)
        self.conv2 = tnn.Conv2d(c, c, 3, 1, 1, bias=False)
        self.bn2 = _bn(c)

    def forward(self, x):
        o = torch.relu(self.bn1(self.conv1(x)))
        o = self.bn2(self.conv2(o))
        return torch.relu(o + x)


class TBottle(tnn.Module):
    def __init__(self, cin, planes, downsample=False):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, planes, 1, bias=False)
        self.bn1 = _bn(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, 1, 1, bias=False)
        self.bn2 = _bn(planes)
        self.conv3 = tnn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = _bn(planes * 4)
        self.downsample = (
            tnn.Sequential(tnn.Conv2d(cin, planes * 4, 1, bias=False),
                           _bn(planes * 4))
            if downsample else None
        )

    def forward(self, x):
        r = x if self.downsample is None else self.downsample(x)
        o = torch.relu(self.bn1(self.conv1(x)))
        o = torch.relu(self.bn2(self.conv2(o)))
        o = self.bn3(self.conv3(o))
        return torch.relu(o + r)


class TModule(tnn.Module):
    """One HighResolutionModule with reference naming."""

    def __init__(self, n_br, chans, multi_out=True):
        super().__init__()
        self.n_br = n_br
        self.multi_out = multi_out
        self.branches = tnn.ModuleList(
            [tnn.Sequential(TBasic(chans[i], chans[i]),
                            TBasic(chans[i], chans[i]))
             for i in range(n_br)]
        )
        fuse = []
        n_out = n_br if multi_out else 1
        for i in range(n_out):
            row = []
            for j in range(n_br):
                if j == i:
                    row.append(tnn.Identity())
                elif j > i:
                    row.append(tnn.Sequential(
                        tnn.Conv2d(chans[j], chans[i], 1, 1, 0, bias=False),
                        _bn(chans[i]),
                        tnn.Upsample(scale_factor=2 ** (j - i),
                                     mode="nearest"),
                    ))
                else:
                    convs = []
                    for k in range(i - j):
                        last = k == i - j - 1
                        cout = chans[i] if last else chans[j]
                        seq = [tnn.Conv2d(chans[j], cout, 3, 2, 1,
                                          bias=False), _bn(cout)]
                        if not last:
                            seq.append(tnn.ReLU(True))
                        convs.append(tnn.Sequential(*seq))
                    row.append(tnn.Sequential(*convs))
            fuse.append(tnn.ModuleList(row))
        self.fuse_layers = tnn.ModuleList(fuse)

    def forward(self, xs):
        xs = [b(x) for b, x in zip(self.branches, xs)]
        outs = []
        n_out = self.n_br if self.multi_out else 1
        for i in range(n_out):
            acc = None
            for j in range(self.n_br):
                v = xs[j] if j == i else self.fuse_layers[i][j](xs[j])
                acc = v if acc is None else acc + v
            outs.append(torch.relu(acc))
        return outs


class THRNet(tnn.Module):
    def __init__(self, num_joints=5):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 3, 2, 1, bias=False)
        self.bn1 = _bn(64)
        self.conv2 = tnn.Conv2d(64, 64, 3, 2, 1, bias=False)
        self.bn2 = _bn(64)
        self.layer1 = tnn.Sequential(
            TBottle(64, 64, downsample=True), TBottle(256, 64),
            TBottle(256, 64), TBottle(256, 64),
        )
        # transition1: 2 branches from 256
        self.transition1 = tnn.ModuleList([
            tnn.Sequential(tnn.Conv2d(256, CH[0], 3, 1, 1, bias=False),
                           _bn(CH[0]), tnn.ReLU(True)),
            tnn.Sequential(tnn.Sequential(
                tnn.Conv2d(256, CH[1], 3, 2, 1, bias=False), _bn(CH[1]),
                tnn.ReLU(True))),
        ])
        self.stage2 = tnn.Sequential(TModule(2, CH[:2]))
        self.transition2 = tnn.ModuleList([
            tnn.Identity(), tnn.Identity(),
            tnn.Sequential(tnn.Sequential(
                tnn.Conv2d(CH[1], CH[2], 3, 2, 1, bias=False), _bn(CH[2]),
                tnn.ReLU(True))),
        ])
        self.stage3 = tnn.Sequential(TModule(3, CH[:3]), TModule(3, CH[:3]))
        self.transition3 = tnn.ModuleList([
            tnn.Identity(), tnn.Identity(), tnn.Identity(),
            tnn.Sequential(tnn.Sequential(
                tnn.Conv2d(CH[2], CH[3], 3, 2, 1, bias=False), _bn(CH[3]),
                tnn.ReLU(True))),
        ])
        self.stage4 = tnn.Sequential(TModule(4, CH, multi_out=False))
        self.final_layer = tnn.Conv2d(CH[0], num_joints, 1)

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
        return self.final_layer(xs[0])


@pytest.mark.slow
def test_hrnet_torch_conversion_full_parity():
    torch.manual_seed(0)
    t = THRNet(num_joints=5).eval()
    for m in t.modules():
        if isinstance(m, tnn.BatchNorm2d):
            m.running_mean.data = torch.randn_like(m.running_mean) * 0.1
            m.running_var.data = torch.rand_like(m.running_var) + 0.5
        if isinstance(m, tnn.Conv2d):
            tnn.init.normal_(m.weight, std=0.05)

    model = PoseHighResolutionNet(num_joints=5, **STAGES)
    x = torch.randn(2, 3, 64, 64)
    xj = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    v = model.init(jax.random.PRNGKey(0), xj, train=False)
    v2 = TC.torch_to_flax_variables(t.state_dict(), dict(v), strict=True)
    out = model.apply(v2, xj, train=False)
    ref = t(x).detach().numpy()
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 3, 1, 2), ref, atol=5e-4
    )

    # and the scanned model via restacking
    scan = PoseHighResolutionNet(num_joints=5, use_scan=True, **STAGES)
    vs_t = scan.init(jax.random.PRNGKey(0), xj, train=False)
    vs = {
        "params": TC.stack_for_scan(
            jax.tree.map(np.asarray, v2["params"]), vs_t["params"]),
        "batch_stats": TC.stack_for_scan(
            jax.tree.map(np.asarray, v2["batch_stats"]), vs_t["batch_stats"]),
    }
    out_s = scan.apply(vs, xj, train=False)
    np.testing.assert_allclose(
        np.asarray(out_s).transpose(0, 3, 1, 2), ref, atol=5e-4
    )


@pytest.mark.slow
def test_load_torch_checkpoint_into_scanned_model(tmp_path):
    """The headline fine-tune recipe: a torch .pth must load into a
    USE_SCAN model through engine.checkpoint.load_torch_checkpoint and
    reproduce the torch outputs (VERDICT r1 missing #1 — previously every
    key silently missed on scanned variables)."""
    import pytest

    from advmix_tpu.engine.checkpoint import load_torch_checkpoint
    from advmix_tpu.models.torch_convert import unstack_from_scan

    torch.manual_seed(1)
    t = THRNet(num_joints=5).eval()
    for m in t.modules():
        if isinstance(m, tnn.BatchNorm2d):
            m.running_mean.data = torch.randn_like(m.running_mean) * 0.1
            m.running_var.data = torch.rand_like(m.running_var) + 0.5
    pth = str(tmp_path / "ckpt.pth")
    torch.save({"state_dict": t.state_dict()}, pth)

    scan = PoseHighResolutionNet(num_joints=5, use_scan=True, **STAGES)
    x = torch.randn(2, 3, 64, 64)
    xj = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    vs = scan.init(jax.random.PRNGKey(0), xj, train=False)

    loaded = load_torch_checkpoint(pth, dict(vs))
    out_s = scan.apply(loaded, xj, train=False)
    ref = t(x).detach().numpy()
    np.testing.assert_allclose(
        np.asarray(out_s).transpose(0, 3, 1, 2), ref, atol=5e-4
    )

    # round-trip sanity for the inverse used inside the loader
    un = unstack_from_scan(jax.tree.map(np.asarray, vs["params"]))
    model = PoseHighResolutionNet(num_joints=5, **STAGES)
    vu = model.init(jax.random.PRNGKey(0), xj, train=False)
    flat_un = jax.tree_util.tree_leaves_with_path(un)
    flat_vu = jax.tree_util.tree_leaves_with_path(vu["params"])
    assert [p for p, _ in flat_un] == [p for p, _ in flat_vu]
    assert [np.shape(v) for _, v in flat_un] == [np.shape(v) for _, v in flat_vu]

    # PRETRAINED_LAYERS filter: loading only 'conv1' must leave final_layer
    # at its init values but still match conv1 (pose_hrnet.py:462-492)
    part = load_torch_checkpoint(pth, dict(vs), pretrained_layers=["conv1"])
    got = np.asarray(part["params"]["conv1"]["kernel"])
    want = t.conv1.weight.detach().numpy().transpose(2, 3, 1, 0)
    np.testing.assert_allclose(got, want, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(part["params"]["final_layer"]["kernel"]),
        np.asarray(vs["params"]["final_layer"]["kernel"]),
    )

    # zero-match loads must raise, not silently fine-tune from random init
    torch.save({"state_dict": {"bogus.weight": torch.zeros(3)}}, pth)
    with pytest.raises(KeyError):
        load_torch_checkpoint(pth, dict(vs))
