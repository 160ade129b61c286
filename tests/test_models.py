"""Model parity and shape tests.

Layer-level and full-model numerical parity against torch oracles (built
from standard torch.nn layers, weights transferred through
torch_convert.torch_to_flax_variables), plus shape/jit sanity for HRNet and
the UNet generator.
"""

import pytest
import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn as tnn

from flax import linen as nn

from advmix_tpu.models import layers as L
from advmix_tpu.models import torch_convert as TC
from advmix_tpu.models.pose_resnet import PoseResNet
from advmix_tpu.models.pose_hrnet import PoseHighResolutionNet
from advmix_tpu.models.unet import UnetGenerator

torch.manual_seed(0)


def _to_nhwc(x_t):
    return jnp.asarray(x_t.detach().numpy().transpose(0, 2, 3, 1))


def _from_nhwc(y):
    return np.asarray(y).transpose(0, 3, 1, 2)


def test_conv_parity():
    t = tnn.Conv2d(3, 8, 3, stride=2, padding=1, bias=False)
    x = torch.randn(2, 3, 16, 12)

    class M(nn.Module):
        @nn.compact
        def __call__(self, x):
            return L.conv("c", 8, 3, 2, 1)(x)

    m = M()
    v = m.init(jax.random.PRNGKey(0), _to_nhwc(x))
    k = t.weight.detach().numpy().transpose(2, 3, 1, 0)
    v = {"params": {"c": {"kernel": jnp.asarray(k)}}}
    out = m.apply(v, _to_nhwc(x))
    ref = t(x).detach().numpy()
    np.testing.assert_allclose(_from_nhwc(out), ref, atol=1e-5)


def test_conv_transpose_parity():
    for k_, p_, op_ in [(4, 1, 0), (3, 1, 1), (2, 0, 0)]:
        t = tnn.ConvTranspose2d(3, 5, k_, stride=2, padding=p_,
                                output_padding=op_, bias=True)
        x = torch.randn(2, 3, 8, 6)

        class M(nn.Module):
            @nn.compact
            def __call__(self, x):
                return L.conv_transpose("d", 5, k_, 2, p_, op_, use_bias=True)(x)

        m = M()
        kernel = t.weight.detach().numpy().transpose(2, 3, 1, 0)
        v = {"params": {"d": {"kernel": jnp.asarray(kernel),
                              "bias": jnp.asarray(t.bias.detach().numpy())}}}
        out = m.apply(v, _to_nhwc(x))
        ref = t(x).detach().numpy()
        assert _from_nhwc(out).shape == ref.shape, (k_, p_, op_)
        np.testing.assert_allclose(_from_nhwc(out), ref, atol=1e-5)


def test_batchnorm_parity_train_and_eval():
    t = tnn.BatchNorm2d(6, momentum=0.1)
    t.weight.data = torch.randn(6)
    t.bias.data = torch.randn(6)
    x = torch.randn(4, 6, 5, 5)

    class M(nn.Module):
        @nn.compact
        def __call__(self, x, train):
            return L.batch_norm("b", train)(x)

    m = M()
    v = {
        "params": {"b": {"scale": jnp.asarray(t.weight.detach().numpy()),
                         "bias": jnp.asarray(t.bias.detach().numpy())}},
        "batch_stats": {"b": {"mean": jnp.zeros(6), "var": jnp.ones(6)}},
    }
    # train mode: normalize by batch stats, update running stats
    t.train()
    ref = t(x).detach().numpy()
    out, mut = m.apply(v, _to_nhwc(x), True, mutable=["batch_stats"])
    np.testing.assert_allclose(_from_nhwc(out), ref, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(mut["batch_stats"]["b"]["mean"]),
        t.running_mean.numpy(), atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(mut["batch_stats"]["b"]["var"]),
        t.running_var.numpy(), atol=1e-4,
    )
    # eval mode: use running stats
    t.eval()
    v["batch_stats"] = {
        "b": {"mean": jnp.asarray(t.running_mean.numpy()),
              "var": jnp.asarray(t.running_var.numpy())}
    }
    ref = t(x).detach().numpy()
    out = m.apply(v, _to_nhwc(x), False)
    np.testing.assert_allclose(_from_nhwc(out), ref, atol=1e-4)


def test_maxpool_instancenorm_upsample_parity():
    x = torch.randn(2, 4, 9, 7)
    ref = tnn.MaxPool2d(3, 2, 1)(x).numpy()
    out = L.max_pool_3x3_s2(_to_nhwc(x))
    np.testing.assert_allclose(_from_nhwc(out), ref, atol=1e-6)

    inorm = tnn.InstanceNorm2d(4)
    ref = inorm(x).detach().numpy()

    class M(nn.Module):
        @nn.compact
        def __call__(self, x):
            return L.instance_norm("n", 4)(x)

    out = M().apply({"params": {}}, _to_nhwc(x))
    np.testing.assert_allclose(_from_nhwc(out), ref, atol=1e-4)

    ref = tnn.Upsample(scale_factor=2, mode="nearest")(x).numpy()
    out = L.upsample_nearest(_to_nhwc(x), 2)
    np.testing.assert_allclose(_from_nhwc(out), ref, atol=1e-6)


# ---------------------------------------------------------------------------
# Full PoseResNet-18 parity via the converter
# ---------------------------------------------------------------------------

class _TorchBasic(tnn.Module):
    def __init__(self, cin, planes, stride=1):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, planes, 3, stride, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes, momentum=0.1)
        self.conv2 = tnn.Conv2d(planes, planes, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(planes, momentum=0.1)
        self.downsample = None
        if stride != 1 or cin != planes:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(cin, planes, 1, stride, bias=False),
                tnn.BatchNorm2d(planes, momentum=0.1),
            )

    def forward(self, x):
        r = x if self.downsample is None else self.downsample(x)
        o = torch.relu(self.bn1(self.conv1(x)))
        o = self.bn2(self.conv2(o))
        return torch.relu(o + r)


class _TorchPoseResNet18(tnn.Module):
    def __init__(self, num_joints=5, deconv_filters=256):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64, momentum=0.1)
        self.maxpool = tnn.MaxPool2d(3, 2, 1)
        specs = [(64, 64, 1), (64, 128, 2), (128, 256, 2), (256, 512, 2)]
        for i, (cin, planes, s) in enumerate(specs, 1):
            blocks = tnn.Sequential(
                _TorchBasic(cin, planes, s), _TorchBasic(planes, planes)
            )
            setattr(self, f"layer{i}", blocks)
        dl = []
        cin = 512
        for i in range(3):
            dl += [
                tnn.ConvTranspose2d(cin, deconv_filters, 4, 2, 1, bias=False),
                tnn.BatchNorm2d(deconv_filters, momentum=0.1),
                tnn.ReLU(inplace=True),
            ]
            cin = deconv_filters
        self.deconv_layers = tnn.Sequential(*dl)
        self.final_layer = tnn.Conv2d(deconv_filters, num_joints, 1)

    def forward(self, x):
        x = self.maxpool(torch.relu(self.bn1(self.conv1(x))))
        x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
        return self.final_layer(self.deconv_layers(x))


def test_pose_resnet18_full_parity():
    t = _TorchPoseResNet18(num_joints=5).eval()
    # randomize running stats so eval-mode parity actually tests them
    for m in t.modules():
        if isinstance(m, tnn.BatchNorm2d):
            m.running_mean.data = torch.randn_like(m.running_mean) * 0.1
            m.running_var.data = torch.rand_like(m.running_var) + 0.5

    model = PoseResNet(num_layers=18, num_joints=5)
    x = torch.randn(2, 3, 64, 48)
    v = model.init(jax.random.PRNGKey(0), _to_nhwc(x), train=False)
    v = TC.torch_to_flax_variables(t.state_dict(), dict(v), strict=True)
    out = model.apply(v, _to_nhwc(x), train=False)
    ref = t(x).detach().numpy()
    assert _from_nhwc(out).shape == ref.shape
    np.testing.assert_allclose(_from_nhwc(out), ref, atol=2e-4)


# ---------------------------------------------------------------------------
# HRNet + UNet structure
# ---------------------------------------------------------------------------

W32_STAGES = dict(
    stage2_cfg=dict(NUM_MODULES=1, NUM_BRANCHES=2, BLOCK="BASIC",
                    NUM_BLOCKS=[4, 4], NUM_CHANNELS=[32, 64],
                    FUSE_METHOD="SUM"),
    stage3_cfg=dict(NUM_MODULES=4, NUM_BRANCHES=3, BLOCK="BASIC",
                    NUM_BLOCKS=[4, 4, 4], NUM_CHANNELS=[32, 64, 128],
                    FUSE_METHOD="SUM"),
    stage4_cfg=dict(NUM_MODULES=3, NUM_BRANCHES=4, BLOCK="BASIC",
                    NUM_BLOCKS=[4, 4, 4, 4], NUM_CHANNELS=[32, 64, 128, 256],
                    FUSE_METHOD="SUM"),
)


def test_hrnet_w32_shapes():
    model = PoseHighResolutionNet(num_joints=17, **W32_STAGES)
    x = jnp.zeros((1, 64, 64, 3))  # H, W must be divisible by 32
    v = model.init(jax.random.PRNGKey(0), x, train=False)
    out = model.apply(v, x, train=False)
    assert out.shape == (1, 16, 16, 17)
    n_params = sum(p.size for p in jax.tree.leaves(v["params"]))
    # HRNet-W32 has ~28.5M params
    assert 27e6 < n_params < 30e6, n_params


def test_unet_generator_shapes():
    g = UnetGenerator(input_nc=9, output_nc=3, num_downs=6)
    x = jnp.zeros((2, 256, 192, 9))
    v = g.init(jax.random.PRNGKey(0), x)
    out = g.apply(v, x)
    assert out.shape == (2, 256, 192, 3)


def test_unet_channel_progression():
    """Encoder/decoder channel plan matches the recursive reference
    construction (ngf * min(2^i, 8), skip concats doubling decoder input)."""
    g = UnetGenerator(input_nc=9, output_nc=3, num_downs=6, ngf=8)
    x = jnp.zeros((1, 64, 64, 9))
    v = g.init(jax.random.PRNGKey(0), x)
    p = v["params"]
    # conv kernels are HWIO; transpose-conv kernels are (kh, kw, out, in)
    assert p["down_0_conv"]["kernel"].shape == (4, 4, 9, 8)
    assert p["down_1_conv"]["kernel"].shape == (4, 4, 8, 16)
    assert p["down_5_conv"]["kernel"].shape == (4, 4, 64, 64)
    # innermost up: 64 -> 64 (no skip); then cat(64,64)=128 -> 64 (second
    # ngf*8 level), cat -> 32, ...; outermost cat(8,8)=16 -> 3
    assert p["up_5_conv"]["kernel"].shape == (4, 4, 64, 64)
    assert p["up_4_conv"]["kernel"].shape == (4, 4, 64, 128)
    assert p["up_3_conv"]["kernel"].shape == (4, 4, 32, 128)
    assert p["up_0_conv"]["kernel"].shape == (4, 4, 3, 16)


@pytest.mark.slow
def test_scan_equivalence():
    """Scanned HRNet == unscanned HRNet numerically after param restacking."""
    from advmix_tpu.models.torch_convert import stack_for_scan

    stages = dict(
        stage2_cfg=dict(NUM_MODULES=1, NUM_BRANCHES=2, BLOCK="BASIC",
                        NUM_BLOCKS=[2, 2], NUM_CHANNELS=[8, 16],
                        FUSE_METHOD="SUM"),
        stage3_cfg=dict(NUM_MODULES=3, NUM_BRANCHES=3, BLOCK="BASIC",
                        NUM_BLOCKS=[2, 2, 2], NUM_CHANNELS=[8, 16, 32],
                        FUSE_METHOD="SUM"),
        stage4_cfg=dict(NUM_MODULES=2, NUM_BRANCHES=4, BLOCK="BASIC",
                        NUM_BLOCKS=[2, 2, 2, 2], NUM_CHANNELS=[8, 16, 32, 64],
                        FUSE_METHOD="SUM"),
    )
    x = jnp.asarray(np.random.RandomState(0).randn(2, 64, 64, 3),
                    jnp.float32)
    plain = PoseHighResolutionNet(num_joints=5, use_scan=False, **stages)
    scan = PoseHighResolutionNet(num_joints=5, use_scan=True, **stages)
    rng = jax.random.PRNGKey(7)
    v_plain = plain.init(rng, x, train=False)
    # randomize so the test is nontrivial (init is ~0 everywhere)
    leaves, tree = jax.tree.flatten(v_plain)
    keys = jax.random.split(jax.random.PRNGKey(3), len(leaves))
    leaves = [jax.random.normal(k, l.shape) * 0.05 + l
              for k, l in zip(keys, leaves)]
    v_plain = jax.tree.unflatten(tree, leaves)

    v_scan_t = scan.init(rng, x, train=False)
    v_scan = {
        "params": stack_for_scan(
            jax.tree.map(np.asarray, v_plain["params"]),
            v_scan_t["params"],
        ),
        "batch_stats": stack_for_scan(
            jax.tree.map(np.asarray, v_plain["batch_stats"]),
            v_scan_t["batch_stats"],
        ),
    }
    out_plain = plain.apply(v_plain, x, train=False)
    out_scan = scan.apply(v_scan, x, train=False)
    np.testing.assert_allclose(
        np.asarray(out_scan), np.asarray(out_plain), atol=1e-5
    )


def test_resnet_scan_equivalence():
    """Scanned PoseResNet == unscanned after stack_for_scan restacking."""
    plain = PoseResNet(num_layers=50, num_joints=4,
                       num_deconv_filters=(16, 16, 16), use_scan=False)
    scan = PoseResNet(num_layers=50, num_joints=4,
                      num_deconv_filters=(16, 16, 16), use_scan=True)
    x = jnp.asarray(np.random.RandomState(0).randn(1, 64, 64, 3), jnp.float32)
    rng = jax.random.PRNGKey(0)
    v_plain = plain.init(rng, x, train=False)
    leaves, tree = jax.tree.flatten(v_plain)
    keys = jax.random.split(jax.random.PRNGKey(5), len(leaves))
    v_plain = jax.tree.unflatten(
        tree, [jax.random.normal(k, l.shape) * 0.05 + l
               for k, l in zip(keys, leaves)]
    )
    v_scan_t = scan.init(rng, x, train=False)
    v_scan = {
        "params": TC.stack_for_scan(
            jax.tree.map(np.asarray, v_plain["params"]), v_scan_t["params"]
        ),
        "batch_stats": TC.stack_for_scan(
            jax.tree.map(np.asarray, v_plain["batch_stats"]),
            v_scan_t["batch_stats"],
        ),
    }
    out_plain = plain.apply(v_plain, x, train=False)
    out_scan = scan.apply(v_scan, x, train=False)
    np.testing.assert_allclose(np.asarray(out_scan), np.asarray(out_plain),
                               atol=1e-5)


@pytest.mark.slow
def test_hrnet_remat_modes_identical():
    """MODEL.EXTRA.REMAT levels ("nested"/"module"/"block"/"none") are pure
    memory/traffic trade-offs — forwards and gradients must be identical."""
    import jax

    from advmix_tpu.models.pose_hrnet import PoseHighResolutionNet

    stages = dict(
        stage2_cfg=dict(NUM_MODULES=1, NUM_BRANCHES=2, BLOCK="BASIC",
                        NUM_BLOCKS=[2, 2], NUM_CHANNELS=[8, 16],
                        FUSE_METHOD="SUM"),
        stage3_cfg=dict(NUM_MODULES=2, NUM_BRANCHES=3, BLOCK="BASIC",
                        NUM_BLOCKS=[2, 2, 2], NUM_CHANNELS=[8, 16, 32],
                        FUSE_METHOD="SUM"),
        stage4_cfg=dict(NUM_MODULES=1, NUM_BRANCHES=4, BLOCK="BASIC",
                        NUM_BLOCKS=[2, 2, 2, 2],
                        NUM_CHANNELS=[8, 16, 32, 64], FUSE_METHOD="SUM"),
    )
    x = jnp.asarray(np.random.RandomState(0).randn(1, 32, 32, 3)
                    .astype(np.float32))
    ref_out = ref_grad = None
    v = None
    for mode in ("nested", "module", "block", "none", True, False):
        m = PoseHighResolutionNet(num_joints=4, use_scan=True, remat=mode,
                                  **stages)
        if v is None:
            v = m.init(jax.random.PRNGKey(0), x, train=False)
        out = m.apply(v, x, train=False)

        def loss(p):
            return m.apply(
                {"params": p, "batch_stats": v["batch_stats"]}, x,
                train=False,
            ).sum()

        g = jax.grad(loss)(v["params"])
        gleaf = np.asarray(jax.tree.leaves(g)[0])
        if ref_out is None:
            ref_out, ref_grad = np.asarray(out), gleaf
        else:
            np.testing.assert_array_equal(np.asarray(out), ref_out)
            # remat reorders backward float ops -> ~1 ULP reassociation
            np.testing.assert_allclose(gleaf, ref_grad, rtol=1e-5,
                                       atol=1e-12)
