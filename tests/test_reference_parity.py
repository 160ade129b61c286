"""Differential parity against the REFERENCE CODE ITSELF.

Imports the actual AdvMix modules from /root/reference/lib (pure
torch/numpy/cv2 — the Cython NMS extensions are stubbed out; only the pure
-python `oks_nms`/`soft_oks_nms` are exercised) and asserts bit-level
agreement with our jax/numpy re-implementations:

- `lib/core/loss.py`          JointsMSELoss (both criterion quirk arms), OHKM
- `lib/core/inference.py`     get_final_preds incl. POST_PROCESS quarter-offset
- `lib/core/evaluate.py`      PCK accuracy incl. the [h, w]/10 norm quirk
- `lib/utils/transforms.py`   get_affine_transform / transform_preds /
                              flip_back / fliplr_joints
- `lib/nms/nms.py`            oks_iou / oks_nms / soft_oks_nms keep lists

This is the strongest parity evidence obtainable without real COCO data
(VERDICT r1 next-round item #3).
"""

import contextlib
import os
import sys
import types
import warnings
from types import SimpleNamespace

import numpy as np
import pytest

REF_LIB = "/root/reference/lib"


@contextlib.contextmanager
def ref_on_path():
    """Put the reference lib on sys.path for an import, suppressing the
    SyntaxWarning its `pretrained_layers[0] is '*'` comparison
    (`lib/models/pose_hrnet.py:487`) fires at compile time — pinned here
    so real warnings from OUR code stay visible in the test output."""
    sys.path.insert(0, REF_LIB)
    try:
        with warnings.catch_warnings():
            warnings.filterwarnings(
                "ignore", message=r'"is" with .?str.? literal',
                category=SyntaxWarning)
            yield
    finally:
        sys.path.remove(REF_LIB)

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_LIB), reason="reference tree not available"
)


@pytest.fixture(scope="module")
def ref():
    """Import the reference modules (restoring sys.path afterwards)."""
    import importlib

    with ref_on_path():
        # lib/nms/nms.py imports its Cython siblings at module top; they are
        # not built here and the pure-python oks functions don't use them.
        for name, attr in (("nms.cpu_nms", "cpu_nms"),
                           ("nms.gpu_nms", "gpu_nms")):
            if name not in sys.modules:
                stub = types.ModuleType(name)
                setattr(stub, attr, None)
                sys.modules[name] = stub
        mods = SimpleNamespace(
            loss=importlib.import_module("core.loss"),
            inference=importlib.import_module("core.inference"),
            evaluate=importlib.import_module("core.evaluate"),
            transforms=importlib.import_module("utils.transforms"),
            nms=importlib.import_module("nms.nms"),
        )
    return mods


def _rand_heatmaps(rng, b=4, j=17, h=64, w=48):
    """Smooth-ish random heatmaps, NCHW float32."""
    hm = rng.rand(b, j, h, w).astype(np.float32)
    return hm


# ---------------------------------------------------------------------------
# losses (lib/core/loss.py)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("use_tw", [True, False])
@pytest.mark.parametrize("smooth_flag", [False, True])
def test_joints_loss_parity(ref, use_tw, smooth_flag):
    import torch

    from advmix_tpu.ops.losses import joints_loss

    rng = np.random.RandomState(0)
    out = _rand_heatmaps(rng) * 2 - 0.5
    tgt = _rand_heatmaps(rng)
    tw = (rng.rand(4, 17, 1) > 0.2).astype(np.float32)

    crit = ref.loss.JointsMSELoss(use_target_weight=use_tw,
                                  smooth_L1=smooth_flag)
    want = crit(torch.from_numpy(out), torch.from_numpy(tgt),
                torch.from_numpy(tw)).item()

    # ours is NHWC; the SMOOTH_L1 flag is inverted in the reference
    # (lib/core/loss.py:16-21): smooth_L1=True selects MSE
    got = joints_loss(
        np.transpose(out, (0, 2, 3, 1)),
        np.transpose(tgt, (0, 2, 3, 1)),
        tw[..., 0],
        use_target_weight=use_tw,
        criterion="mse" if smooth_flag else "smooth_l1",
    )
    np.testing.assert_allclose(float(got), want, rtol=2e-5)


def test_ohkm_loss_parity(ref):
    import torch

    from advmix_tpu.ops.losses import joints_ohkm_loss

    rng = np.random.RandomState(1)
    out = _rand_heatmaps(rng) * 2 - 0.5
    tgt = _rand_heatmaps(rng)
    tw = (rng.rand(4, 17, 1) > 0.2).astype(np.float32)

    crit = ref.loss.JointsOHKMMSELoss(use_target_weight=True, topk=8)
    want = crit(torch.from_numpy(out), torch.from_numpy(tgt),
                torch.from_numpy(tw)).item()
    got = joints_ohkm_loss(
        np.transpose(out, (0, 2, 3, 1)),
        np.transpose(tgt, (0, 2, 3, 1)),
        tw[..., 0], use_target_weight=True, topk=8,
    )
    np.testing.assert_allclose(float(got), want, rtol=2e-5)


# ---------------------------------------------------------------------------
# decode (lib/core/inference.py) + inverse transform (utils/transforms.py)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("post", [False, True])
def test_get_final_preds_parity(ref, post):
    from advmix_tpu.ops.heatmap import get_final_preds

    rng = np.random.RandomState(2)
    hm = _rand_heatmaps(rng)
    center = rng.uniform(80, 160, (4, 2)).astype(np.float32)
    scale = rng.uniform(0.8, 2.0, (4, 2)).astype(np.float32)

    cfg = SimpleNamespace(
        TEST=SimpleNamespace(POST_PROCESS=post),
        MODEL=SimpleNamespace(IMAGE_SIZE=[192, 256]),
    )
    want_p, want_v = ref.inference.get_final_preds(
        cfg, None, hm.copy(), center.copy(), scale.copy()
    )

    got_p, got_v = get_final_preds(
        np.transpose(hm, (0, 2, 3, 1)), center, scale, post_process=post
    )
    np.testing.assert_allclose(np.asarray(got_p), want_p, atol=2e-3)
    np.testing.assert_allclose(np.asarray(got_v)[..., 0],
                               want_v[..., 0], atol=1e-6)


def test_pck_accuracy_parity(ref):
    import torch

    from advmix_tpu.ops.heatmap import pck_accuracy

    rng = np.random.RandomState(3)
    out = _rand_heatmaps(rng, b=6, j=8, h=32, w=24)
    tgt = _rand_heatmaps(rng, b=6, j=8, h=32, w=24)
    # zero a joint column so the "no valid sample -> -1" arm is exercised
    tgt[:, 3] = 0.0

    acc, avg, cnt, _ = ref.evaluate.accuracy(
        torch.from_numpy(out.copy()), torch.from_numpy(tgt.copy())
    )
    per_joint, got_avg, got_cnt = pck_accuracy(
        np.transpose(out, (0, 2, 3, 1)), np.transpose(tgt, (0, 2, 3, 1))
    )
    np.testing.assert_allclose(np.asarray(per_joint), acc[1:], atol=1e-6)
    np.testing.assert_allclose(float(got_avg), avg, atol=1e-6)
    assert int(got_cnt) == cnt


def test_flip_back_parity(ref):
    from advmix_tpu.ops.transforms import flip_back

    rng = np.random.RandomState(4)
    hm = _rand_heatmaps(rng, b=3, j=6, h=16, w=12)
    pairs = [(0, 1), (2, 3)]
    want = ref.transforms.flip_back(hm.copy(), pairs)
    got = flip_back(np.transpose(hm, (0, 2, 3, 1)),
                    tuple(tuple(p) for p in pairs))
    np.testing.assert_allclose(
        np.transpose(np.asarray(got), (0, 3, 1, 2)), want, atol=1e-7
    )


def test_affine_transform_parity(ref):
    import cv2

    from advmix_tpu.ops.transforms import (
        get_affine_transform,
        transform_preds,
        fliplr_joints,
    )

    rng = np.random.RandomState(5)
    for i in range(8):
        center = rng.uniform(50, 300, 2).astype(np.float32)
        scale = rng.uniform(0.5, 3.0, 2).astype(np.float32)
        rot = float(rng.uniform(-80, 80)) if i % 2 else 0.0
        size = (192, 256)
        want = ref.transforms.get_affine_transform(center, scale, rot, size)
        got = get_affine_transform(center, scale, rot, size)
        np.testing.assert_allclose(got, want, atol=1e-9)

        # identical warped crops through cv2 with each matrix
        img = rng.randint(0, 255, (333, 407, 3)).astype(np.uint8)
        crop_w = cv2.warpAffine(img, want, size, flags=cv2.INTER_LINEAR)
        crop_g = cv2.warpAffine(img, np.asarray(got, np.float64), size,
                                flags=cv2.INTER_LINEAR)
        # matrices agree to 1e-9; uint8 bilinear rounding may still flip
        # the odd pixel by 1 LSB
        diff = crop_w.astype(np.int16) - crop_g.astype(np.int16)
        assert np.abs(diff).max() <= 1
        assert (diff != 0).mean() < 0.01

    coords = rng.uniform(0, 48, (17, 2)).astype(np.float32)
    center = np.array([123.0, 87.0], np.float32)
    scale = np.array([1.7, 2.1], np.float32)
    want = ref.transforms.transform_preds(
        coords.copy(), center, scale, [48, 64]
    )
    got = transform_preds(coords, center, scale, (48, 64))
    np.testing.assert_allclose(got, want, atol=1e-4)

    joints = rng.uniform(0, 200, (6, 3)).astype(np.float32)
    vis = np.ones((6, 3), np.float32)
    vis[4] = 0
    pairs = [(0, 1), (2, 3)]
    want_j, want_v = ref.transforms.fliplr_joints(
        joints.copy(), vis.copy(), 192, pairs
    )
    got_j, got_v = fliplr_joints(joints.copy(), vis.copy(), 192, pairs)
    np.testing.assert_allclose(got_j, want_j, atol=1e-6)
    np.testing.assert_allclose(got_v, want_v, atol=1e-6)


# ---------------------------------------------------------------------------
# OKS NMS (lib/nms/nms.py pure-python path — the eval-time NMS)
# ---------------------------------------------------------------------------

def _kpts_db(rng, n=14, j=17):
    db = []
    base = rng.uniform(40, 160, (1, j, 2))
    for _ in range(n):
        xy = base + rng.randn(1, j, 2) * rng.uniform(1, 25)
        v = rng.uniform(0, 1, (1, j, 1))
        db.append({
            "keypoints": np.concatenate([xy, v], -1)[0].astype(np.float64),
            "score": float(rng.uniform(0.1, 1.0)),
            "area": float(rng.uniform(1000, 9000)),
        })
    return db


@pytest.mark.parametrize("thresh", [0.5, 0.9])
def test_oks_nms_keep_parity(ref, thresh):
    from advmix_tpu.ops.nms import oks_nms_np, soft_oks_nms_np

    rng = np.random.RandomState(6)
    for trial in range(5):
        db = _kpts_db(rng)
        kpts = np.array([d["keypoints"].flatten() for d in db])
        scores = np.array([d["score"] for d in db])
        areas = np.array([d["area"] for d in db])

        want = [int(k) for k in ref.nms.oks_nms(db, thresh)]
        got = oks_nms_np(kpts, scores, areas, thresh)
        assert got == want, (trial, got, want)

        want_s = [int(k) for k in ref.nms.soft_oks_nms(db, thresh)]
        got_s = soft_oks_nms_np(kpts, scores, areas, thresh)
        assert got_s == want_s, (trial, got_s, want_s)


def test_oks_iou_in_vis_thre_quirk_parity(ref):
    """The reference's `list(a) and list(b)` visibility mask bug
    (lib/nms/nms.py:91) is reproduced bit-for-bit."""
    from advmix_tpu.ops.nms import oks_iou_np

    rng = np.random.RandomState(7)
    db = _kpts_db(rng, n=5)
    kpts = np.array([d["keypoints"].flatten() for d in db])
    areas = np.array([d["area"] for d in db])
    want = ref.nms.oks_iou(kpts[0], kpts[1:], areas[0], areas[1:],
                           None, in_vis_thre=0.4)
    got = oks_iou_np(kpts[0], kpts[1:], areas[0], areas[1:],
                     None, in_vis_thre=0.4)
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_generate_target_parity(ref):
    """Heatmap target generation vs the reference's actual
    JointsDataset.generate_target (quantize-paste semantics incl. the
    int-cast of mu and out-of-bounds weight zeroing,
    JointsDataset.py:412-491). The module needs imagecorruptions/
    json_tricks stubs (not installed; unused by generate_target)."""
    import importlib

    from advmix_tpu.ops.heatmap import generate_target

    for name, attrs in (("json_tricks", ["load", "dump"]),
                        ("imagecorruptions", ["corrupt",
                                              "get_corruption_names"]),
                        ("pycocotools", []),
                        ("pycocotools.coco", ["COCO"]),
                        ("pycocotools.cocoeval", ["COCOeval"])):
        if name not in sys.modules:
            stub = types.ModuleType(name)
            for a in attrs:
                setattr(stub, a, None)
            sys.modules[name] = stub
    with ref_on_path():
        jd_mod = importlib.import_module("dataset.JointsDataset")

    num_joints, sigma = 17, 2
    image_size = np.array([192, 256])
    heatmap_size = np.array([48, 64])

    jd = jd_mod.JointsDataset.__new__(jd_mod.JointsDataset)
    jd.num_joints = num_joints
    jd.target_type = "gaussian"
    jd.sigma = sigma
    jd.image_size = image_size
    jd.heatmap_size = heatmap_size
    jd.use_different_joints_weight = False
    jd.joints_weight = np.ones((num_joints, 1), np.float32)

    rng = np.random.RandomState(8)
    b = 6
    joints = np.zeros((b, num_joints, 3), np.float32)
    # in-bounds, near-edge, and far out-of-bounds joints
    joints[:, :, 0] = rng.uniform(-40, 240, (b, num_joints))
    joints[:, :, 1] = rng.uniform(-40, 300, (b, num_joints))
    vis = (rng.rand(b, num_joints, 3) > 0.2).astype(np.float32)
    vis[:, :, 1:] = vis[:, :, :1]

    got_t, _, got_w = generate_target(
        joints[:, :, :2], vis[:, :, 0], (192, 256), (48, 64), sigma
    )
    got_t = np.asarray(got_t)  # (B, Hh, Hw, J)
    got_w = np.asarray(got_w)

    for i in range(b):
        out = jd.generate_target(joints[i], vis[i])
        want_t = out[0][0] if isinstance(out[0], list) else out[0]
        want_w = out[1]
        np.testing.assert_allclose(
            got_t[i].transpose(2, 0, 1), want_t, atol=1e-6,
            err_msg=f"sample {i}",
        )
        np.testing.assert_allclose(got_w[i], want_w[:, 0], atol=0)


def test_eval_chain_parity(ref):
    """The COMPOSED eval math (flip test -> reference flip_back ->
    SHIFT_HEATMAP -> average -> get_final_preds) of our jitted eval step
    vs the reference functions applied to the same model outputs
    (lib/core/function.py:241-261 + inference.py:52-95)."""
    import jax
    import jax.numpy as jnp

    from advmix_tpu.config import load_config
    from advmix_tpu.engine import steps
    from advmix_tpu.models.pose_resnet import PoseResNet
    from advmix_tpu.parallel import get_mesh, device_put_batch
    from advmix_tpu.parallel.mesh import replicate

    cfg = load_config()
    cfg.defrost()
    cfg.MODEL.IMAGE_SIZE = [32, 32]
    cfg.MODEL.HEATMAP_SIZE = [8, 8]
    cfg.MODEL.NUM_JOINTS = 6
    cfg.TEST.FLIP_TEST = True
    cfg.TEST.POST_PROCESS = True
    cfg.TEST.SHIFT_HEATMAP = True
    cfg.freeze()
    mesh = get_mesh()
    model = PoseResNet(num_layers=18, num_joints=6,
                       num_deconv_filters=(16, 16, 16))
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((2, 32, 32, 3)),
                   train=False)
    flip_pairs = [[0, 1], [2, 3]]
    eval_step = steps.make_eval_step(model, cfg, flip_pairs, mesh)

    rng = np.random.RandomState(12)
    b = mesh.devices.size * 2
    img = rng.randn(b, 32, 32, 3).astype(np.float32)
    center = rng.uniform(40, 80, (b, 2)).astype(np.float32)
    scale = rng.uniform(0.5, 1.2, (b, 2)).astype(np.float32)
    batch = device_put_batch(
        {"image": jnp.asarray(img),
         "target": jnp.asarray(rng.rand(b, 8, 8, 6).astype(np.float32)),
         "target_weight": jnp.ones((b, 6), jnp.float32),
         "center": jnp.asarray(center), "scale": jnp.asarray(scale)},
        mesh,
    )
    preds, maxvals, _ = eval_step(
        replicate(v["params"], mesh),
        replicate(v.get("batch_stats", {}), mesh), batch,
    )
    preds, maxvals = np.asarray(preds), np.asarray(maxvals)

    # reference-side replication on the SAME heatmaps (NCHW numpy)
    out = np.asarray(model.apply(v, jnp.asarray(img), train=False))
    out_f = np.asarray(
        model.apply(v, jnp.asarray(img[:, :, ::-1, :]), train=False)
    )
    hm = out.transpose(0, 3, 1, 2)
    hm_f = ref.transforms.flip_back(
        np.ascontiguousarray(out_f.transpose(0, 3, 1, 2)), flip_pairs
    )
    hm_f[:, :, :, 1:] = hm_f[:, :, :, 0:-1]  # SHIFT_HEATMAP (:258-260)
    avg = (hm + hm_f) * 0.5
    rcfg = SimpleNamespace(
        TEST=SimpleNamespace(POST_PROCESS=True),
        MODEL=SimpleNamespace(IMAGE_SIZE=[32, 32]),
    )
    want_p, want_v = ref.inference.get_final_preds(
        rcfg, None, avg.astype(np.float32), center, scale
    )
    np.testing.assert_allclose(preds, want_p, atol=5e-3)
    np.testing.assert_allclose(maxvals[..., 0], want_v[..., 0], atol=1e-4)


def test_unet_generator_forward_parity(ref):
    """Full forward parity of the AdvMix generator: the reference
    UnetGenerator(9, 3, 6) (recursive blocks, InstanceNorm, LeakyReLU 0.2,
    with_tanh=False — exactly `tools/train.py:67`'s instantiation) vs our
    flattened flax UnetGenerator fed the converted weights
    (torch_convert.torch_unet_to_flax)."""
    import importlib

    import jax
    import jax.numpy as jnp
    import torch

    from advmix_tpu.models import get_generator
    from advmix_tpu.models.torch_convert import torch_unet_to_flax

    with ref_on_path():
        ug = importlib.import_module("models.Unet_generator")

    torch.manual_seed(0)
    tg = ug.UnetGenerator(input_nc=9, output_nc=3, num_downs=6).eval()
    for m in tg.modules():
        if isinstance(m, (torch.nn.Conv2d, torch.nn.ConvTranspose2d)):
            torch.nn.init.normal_(m.weight, std=0.05)
            if m.bias is not None:
                torch.nn.init.normal_(m.bias, std=0.02)

    g = get_generator()
    x = torch.randn(2, 9, 64, 64)
    xj = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    v = g.init(jax.random.PRNGKey(0), xj)
    v2 = torch_unet_to_flax(tg.state_dict(), dict(v), num_downs=6)
    out = np.asarray(g.apply(v2, xj)).transpose(0, 3, 1, 2)
    want = tg(x).detach().numpy()
    np.testing.assert_allclose(out, want, atol=5e-4)
