"""Compiled train/eval steps over a data-parallel mesh.

The reference's hot loops (`lib/core/function.py:30-197`) interleave host
logging, `.detach()`/`requires_grad` toggling, and four separate
DataParallel scatter/gather forwards per AdvMix iteration. Here each
iteration is ONE jitted program under `shard_map` over the "data" mesh
axis:

- standard step: forward + loss + backward + adam update + on-device PCK
  (the reference syncs to CPU numpy every step for PCK,
  `lib/core/evaluate.py:41`).
- advmix step (`train_advmix`, lib/core/function.py:107-197): G forward +
  softmax mixing, D update on the stop-gradient'd mix with the KD-teacher
  term, then G update by back-propagating through the *saved* G vjp with
  the *updated* D params — exactly reproducing detach()/set_require_grad
  semantics, including D's BatchNorm running stats updating twice per
  iteration (torch runs D in train mode for both forwards).

Gradients/metrics are `lax.pmean`'d across replicas; BatchNorm batch stats
are computed per-replica (matching DataParallel, SURVEY §7.4) and then
averaged so the stored state is deterministic.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

import optax

from ..ops.losses import (
    joints_loss,
    joints_loss_per_sample,
    joints_ohkm_loss,
    joints_ohkm_loss_per_sample,
)
from ..ops.heatmap import pck_sums, pck_from_sums, get_final_preds
from ..ops.transforms import flip_back, shift_heatmap_right
from ..models.layers import cross_replica_bn
from ..parallel.mesh import data_axes


def _bn_axis_for(cfg, axis: str):
    """TRAIN.CROSS_REPLICA_BN -> sync-BN across the data axis. Default
    (False) keeps per-replica stats, matching the reference's
    DataParallel behavior (SURVEY §7 hard part 4)."""
    return axis if bool(getattr(cfg.TRAIN, "CROSS_REPLICA_BN", False)) else None


def _with_bn_axis(fn, axis_name):
    """Wrap a (to-be-traced) step body so BN layers constructed during its
    trace compute cross-replica statistics. functools.wraps keeps the
    function name (and thus HLO module naming / the persistent compile
    cache key) identical to the unwrapped step."""
    import functools

    @functools.wraps(fn)
    def wrapped(*a, **k):
        with cross_replica_bn(axis_name):
            return fn(*a, **k)

    return wrapped


def _criterion_kind(cfg) -> str:
    # LOSS.SMOOTH_L1 carries the reference's inverted meaning
    # (lib/core/loss.py:16-21): False -> SmoothL1, True -> MSE.
    return "mse" if cfg.LOSS.SMOOTH_L1 else "smooth_l1"


def _loss_fn_for(cfg) -> Callable:
    if cfg.LOSS.USE_OHKM:
        topk = cfg.LOSS.TOPK

        def fn(out, target, tw):
            return joints_ohkm_loss(
                out, target, tw, cfg.LOSS.USE_TARGET_WEIGHT, topk
            )

        return fn
    crit = _criterion_kind(cfg)
    use_tw = cfg.LOSS.USE_TARGET_WEIGHT

    def fn(out, target, tw):
        return joints_loss(out, target, tw, use_tw, crit)

    return fn


def _per_sample_loss_fn_for(cfg) -> Callable:
    """(B,)-shaped variant for eval-metric masking of padded tail rows."""
    if cfg.LOSS.USE_OHKM:
        topk = cfg.LOSS.TOPK

        def fn(out, target, tw):
            return joints_ohkm_loss_per_sample(
                out, target, tw, cfg.LOSS.USE_TARGET_WEIGHT, topk
            )

        return fn
    crit = _criterion_kind(cfg)
    use_tw = cfg.LOSS.USE_TARGET_WEIGHT

    def fn(out, target, tw):
        return joints_loss_per_sample(out, target, tw, use_tw, crit)

    return fn


# ---------------------------------------------------------------------------
# Standard training step (lib/core/function.py:30-95)
# ---------------------------------------------------------------------------

def make_train_step(model, tx, cfg, mesh: Mesh, axis: str = "data",
                    debug: bool = False):
    """When `debug`, the step also returns the output heatmaps and decoded
    peak coords (sharded), so the host can dump debug images every
    PRINT_FREQ like the reference (`lib/core/function.py:92-95`)."""
    axis = data_axes(mesh, axis)  # ("dcn", "data") on multi-slice meshes
    from .heatmap_debug import debug_outputs

    loss_of = _loss_fn_for(cfg)

    def step(state, batch):
        def loss_fn(params):
            out, mut = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch["image"],
                train=True,
                mutable=["batch_stats"],
            )
            loss = loss_of(out, batch["target"], batch["target_weight"])
            return loss, (out, mut["batch_stats"])

        (loss, (out, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        grads = lax.pmean(grads, axis)
        new_stats = lax.pmean(new_stats, axis)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)

        # exact global PCK: psum per-joint hit/valid counts, THEN
        # finalize (pmean of per-replica averages would weight replicas
        # equally regardless of their valid-sample counts)
        hit_j, val_j = pck_sums(out, batch["target"])
        _, acc, cnt = pck_from_sums(
            lax.psum(hit_j, axis), lax.psum(val_j, axis)
        )
        metrics = {
            "loss": lax.pmean(loss, axis),
            "acc": acc,
            "acc_cnt": cnt,
        }
        new_state = state.replace(
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt,
            step=state.step + 1,
        )
        if debug:
            return new_state, metrics, debug_outputs(out)
        return new_state, metrics

    out_specs = (P(), P(), P(axis)) if debug else (P(), P())
    sharded = jax.shard_map(
        _with_bn_axis(step, _bn_axis_for(cfg, axis)),
        mesh=mesh,
        in_specs=(P(), P(axis)),
        out_specs=out_specs,
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=0)


# ---------------------------------------------------------------------------
# AdvMix min-max step (lib/core/function.py:107-197)
# ---------------------------------------------------------------------------

def make_advmix_step(
    model_d,
    model_g,
    tx_d,
    tx_g,
    cfg,
    mesh: Mesh,
    alpha: float = 0.1,
    adv_loss_weight: float = 1.0,
    num_views: int = 3,
    axis: str = "data",
    debug: bool = False,
    teacher_apply=None,
    _mutation=None,
):
    """`teacher_apply(variables, images) -> output` overrides the teacher
    forward (default: `model_d.apply(..., train=False)`) — the int8
    teacher perf lever (`ops.quant.make_int8_teacher_apply`), opt-in via
    TRAIN.INT8_TEACHER.

    `_mutation` is TEST-ONLY fault injection for the f64 differential's
    mutation battery (tests/test_advmix_differential.py): it plants the
    semantic bugs that could silently occur in this functional
    formulation, so the differential can prove it would catch them.
    Always None in production paths. Values: "single_bn_update" (drop the
    G-step's second BN stats update — function.py:160 runs D in train
    mode a second time), "stale_d_in_g_step" (G update sees pre-update D
    — function.py:155 steps the optimizer BEFORE the G forward)."""
    assert _mutation in (None, "single_bn_update", "stale_d_in_g_step")
    axis = data_axes(mesh, axis)  # ("dcn", "data") on multi-slice meshes
    from .heatmap_debug import debug_outputs

    loss_of = _loss_fn_for(cfg)
    if teacher_apply is None:
        def teacher_apply(variables, images):
            return model_d.apply(variables, images, train=False)

    def step(state, batch):
        views = batch["views"]  # (B, H, W, 3*K) channel-concat of K views
        clean = views[..., :3]
        target = batch["target"]
        tw = batch["target_weight"]

        # G forward once; save the vjp so the G update back-propagates
        # through the same mixing (mix_weight computed pre-D-update,
        # function.py:137-144).
        def g_forward(pg):
            logits = model_g.apply({"params": pg}, views)
            w = jax.nn.softmax(logits, axis=-1)  # (B, H, W, K)
            mixed = jnp.zeros_like(clean)
            for k in range(num_views):
                mixed = mixed + views[..., 3 * k : 3 * k + 3] * w[..., k : k + 1]
            return mixed

        mixed, g_vjp = jax.vjp(g_forward, state.params_g)
        mixed_sg = lax.stop_gradient(mixed)  # == tmp.detach(), function.py:146

        # Teacher forward on the clean view, eval mode (function.py:148-149).
        teacher_out = teacher_apply(
            {"params": state.params_t, "batch_stats": state.batch_stats_t},
            clean,
        )
        teacher_out = lax.stop_gradient(teacher_out)

        # ---- D update (function.py:146-155) ----
        def loss_d_fn(pd):
            out, mut = model_d.apply(
                {"params": pd, "batch_stats": state.batch_stats_d},
                mixed_sg,
                train=True,
                mutable=["batch_stats"],
            )
            l_hm = loss_of(out, target, tw)
            l_kd = loss_of(out, teacher_out, tw)
            loss = l_hm * (1.0 - alpha) + l_kd * alpha
            return loss, mut["batch_stats"]

        (loss_d, stats_after_d), grads_d = jax.value_and_grad(
            loss_d_fn, has_aux=True
        )(state.params_d)
        grads_d = lax.pmean(grads_d, axis)
        stats_after_d = lax.pmean(stats_after_d, axis)
        upd_d, new_opt_d = tx_d.update(grads_d, state.opt_state_d, state.params_d)
        new_params_d = optax.apply_updates(state.params_d, upd_d)

        # ---- G update (function.py:158-164) ----
        # D is "frozen" (set_require_grad False) but has its UPDATED params
        # and runs in train mode again — second BN stats update per step.
        if _mutation == "stale_d_in_g_step":
            g_view_params_d, g_view_stats_d = state.params_d, state.batch_stats_d
        else:
            g_view_params_d, g_view_stats_d = new_params_d, stats_after_d

        def loss_g_fn(mixed_in):
            out, mut = model_d.apply(
                {"params": g_view_params_d, "batch_stats": g_view_stats_d},
                mixed_in,
                train=True,
                mutable=["batch_stats"],
            )
            loss = -loss_of(out, target, tw) * adv_loss_weight
            return loss, (out, mut["batch_stats"])

        (loss_g, (out_g, stats_after_g)), dmixed = jax.value_and_grad(
            loss_g_fn, has_aux=True
        )(mixed)
        stats_after_g = lax.pmean(stats_after_g, axis)
        (grads_g,) = g_vjp(dmixed)
        grads_g = lax.pmean(grads_g, axis)
        upd_g, new_opt_g = tx_g.update(grads_g, state.opt_state_g, state.params_g)
        new_params_g = optax.apply_updates(state.params_g, upd_g)

        # Metrics: loss meter tracks loss_D, accuracy uses the G-step D
        # output (function.py:167-171).
        hit_j, val_j = pck_sums(out_g, target)
        _, acc, cnt = pck_from_sums(
            lax.psum(hit_j, axis), lax.psum(val_j, axis)
        )
        metrics = {
            "loss_d": lax.pmean(loss_d, axis),
            "loss_g": lax.pmean(loss_g, axis),
            "acc": acc,
            "acc_cnt": cnt,
        }
        new_state = state.replace(
            params_d=new_params_d,
            batch_stats_d=(stats_after_d if _mutation == "single_bn_update"
                           else stats_after_g),
            opt_state_d=new_opt_d,
            params_g=new_params_g,
            opt_state_g=new_opt_g,
            step=state.step + 1,
        )
        if debug:
            dbg = debug_outputs(out_g)
            dbg["mixed"] = mixed_sg  # the adversarial mix, for image dumps
            return new_state, metrics, dbg
        return new_state, metrics

    out_specs = (P(), P(), P(axis)) if debug else (P(), P())
    sharded = jax.shard_map(
        _with_bn_axis(step, _bn_axis_for(cfg, axis)),
        mesh=mesh,
        in_specs=(P(), P(axis)),
        out_specs=out_specs,
        check_vma=False,
    )
    fn = jax.jit(sharded, donate_argnums=0)
    # callers that fuse preprocessing into one program (bench.py) trace
    # the unjitted shard_map directly — the nested-jit boundary otherwise
    # pins default layouts and costs two full-batch layout copies
    fn.sharded = sharded
    return fn


# ---------------------------------------------------------------------------
# Eval step (lib/core/function.py:200-318)
# ---------------------------------------------------------------------------

def make_eval_step(model, cfg, flip_pairs: Sequence, mesh: Mesh,
                   axis: str = "data", debug: bool = False):
    """When `debug`, additionally returns the output heatmaps + decoded
    heatmap-space peaks (sharded) so validate() can dump joint-overlay /
    heatmap grids every PRINT_FREQ like the reference's validate
    (`lib/core/function.py:301-316`)."""
    axis = data_axes(mesh, axis)  # ("dcn", "data") on multi-slice meshes
    from .heatmap_debug import debug_outputs
    from ..ops.heatmap import get_final_preds_softargmax
    from ..ops.transforms import transform_preds_jax

    loss_per_sample = _per_sample_loss_fn_for(cfg)
    flip_test = cfg.TEST.FLIP_TEST
    shift = cfg.TEST.SHIFT_HEATMAP
    post = cfg.TEST.POST_PROCESS
    soft = cfg.TEST.SOFT_ARGMAX  # soft-argmax decode variant (:129-162)
    pairs = tuple(tuple(p) for p in flip_pairs)
    # production decode path on TPU is the fused Pallas kernel (parity
    # tested against the XLA path in tests/test_native_pallas.py); XLA
    # fallback elsewhere (CPU tests, interpret-free)
    use_pallas = jax.default_backend() == "tpu"

    def decode(out, center, scale):
        if use_pallas:
            from ..ops.pallas.decode_kernel import decode_heatmaps_pallas

            coords, maxvals = decode_heatmaps_pallas(out, post_process=post)
            h, w = out.shape[1], out.shape[2]
            return transform_preds_jax(coords, center, scale, (w, h)), maxvals
        return get_final_preds(out, center, scale, post_process=post)

    def step(params, batch_stats, batch):
        variables = {"params": params, "batch_stats": batch_stats}
        out = model.apply(variables, batch["image"], train=False)
        if flip_test:
            out_f = model.apply(
                variables, batch["image"][:, :, ::-1, :], train=False
            )
            out_f = flip_back(out_f, pairs)
            if shift:
                out_f = shift_heatmap_right(out_f)
            out = (out + out_f) * 0.5
        # Padded tail rows (Loader repeats the last sample so compiled
        # shapes stay static) are masked out of the logged metrics:
        # loss is psum(per-sample)/psum(n_valid), exact regardless of
        # TEST.BATCH_SIZE_PER_GPU; PCK excludes masked rows.
        valid = batch.get("valid")
        if valid is None:
            valid = jnp.ones((batch["image"].shape[0],), jnp.float32)
        v = valid.astype(jnp.float32)
        ps = loss_per_sample(out, batch["target"], batch["target_weight"])
        loss_sum = lax.psum(jnp.sum(ps * v), axis)
        n_valid = lax.psum(jnp.sum(v), axis)
        hit_j, val_j = pck_sums(out, batch["target"], sample_mask=v)
        if soft:
            preds, maxvals = get_final_preds_softargmax(
                out, batch["center"], batch["scale"], post_process=post
            )
        else:
            preds, maxvals = decode(out, batch["center"], batch["scale"])
        hit_j = lax.psum(hit_j, axis)
        val_j = lax.psum(val_j, axis)
        _, acc, cnt = pck_from_sums(hit_j, val_j)
        metrics = {
            "loss": loss_sum / jnp.maximum(n_valid, 1.0),
            "acc": acc,
            "acc_cnt": cnt,
            # raw counts so validate() can finalize the EXACT whole-set
            # PCK across batches (a weighted mean of per-batch averages
            # is not split-invariant)
            "pck_hit_j": hit_j,
            "pck_valid_j": val_j,
        }
        if debug:
            return preds, maxvals, metrics, debug_outputs(out)
        return preds, maxvals, metrics

    out_specs = (
        (P(axis), P(axis), P(), P(axis)) if debug
        else (P(axis), P(axis), P())
    )
    sharded = jax.shard_map(
        step,
        mesh=mesh,
        in_specs=(P(), P(), P(axis)),
        out_specs=out_specs,
        check_vma=False,
    )
    return jax.jit(sharded)


# ---------------------------------------------------------------------------
# Bottom-up (HigherHRNet) steps — no reference counterpart (SURVEY §6 gap);
# loss composition per the public HigherHRNet recipe: per-scale heatmap MSE
# masked by the crowd/unannotated ignore regions + associative-embedding
# pull/push at the 1/4 tag head (the AE loss reads GT joint locations of
# annotated people only, so the ignore mask has nothing to mask there).
# ---------------------------------------------------------------------------

def _mask_at(mask, h: int, w: int):
    """Resize the (B, S, S) input-resolution valid mask to an output scale
    and re-binarize (the public recipe warps per-scale with nearest; a
    linear resize + 0.5 threshold of the same binary mask is the
    device-side analog). None passes through (unmasked loss)."""
    if mask is None:
        return None
    if mask.shape[1] == h and mask.shape[2] == w:
        return mask
    m = jax.image.resize(mask, (mask.shape[0], h, w), method="linear")
    return (m > 0.5).astype(jnp.float32)

def make_bottomup_step(
    model,
    tx,
    cfg,
    mesh: Mesh,
    pull_factor: float = 0.001,
    push_factor: float = 0.001,
    axis: str = "data",
):
    axis = data_axes(mesh, axis)  # ("dcn", "data") on multi-slice meshes
    from ..ops.ae import ae_loss, bottomup_heatmap_loss, generate_bottomup_target

    num_joints = cfg.MODEL.NUM_JOINTS
    input_size = int(cfg.MODEL.IMAGE_SIZE[0])
    sigma = float(cfg.MODEL.SIGMA)

    def step(state, batch):
        joints = batch["joints"]  # (B, M, J, 2) in input coords
        vis = batch["joints_vis"]  # (B, M, J)
        mask = batch.get("mask")  # (B, S, S) valid mask or None

        def loss_fn(params):
            outs, mut = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch["image"],
                train=True,
                mutable=["batch_stats"],
            )
            total = 0.0
            pull = push = 0.0
            locs_quarter = None
            for si, out in enumerate(outs):
                res = out.shape[1]
                ratio = res / input_size
                tgt, locs = generate_bottomup_target(
                    joints * ratio, vis, (out.shape[2], out.shape[1]), sigma
                )
                total = total + bottomup_heatmap_loss(
                    out[..., :num_joints], tgt,
                    mask=_mask_at(mask, out.shape[1], out.shape[2]),
                )
                if si == 0:
                    locs_quarter = locs
                    pull, push = ae_loss(out[..., num_joints:], locs, vis)
            total = total + pull_factor * pull + push_factor * push
            return total, (mut["batch_stats"], pull, push)

        (loss, (new_stats, pull, push)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        grads = lax.pmean(grads, axis)
        new_stats = lax.pmean(new_stats, axis)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = {
            "loss": lax.pmean(loss, axis),
            "pull": lax.pmean(pull, axis),
            "push": lax.pmean(push, axis),
            # PCK has no single-person meaning here; report a constant count
            "acc": lax.pmean(jnp.zeros(()), axis),
            "acc_cnt": lax.psum(jnp.zeros((), jnp.int32), axis),
        }
        new_state = state.replace(
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt,
            step=state.step + 1,
        )
        return new_state, metrics

    sharded = jax.shard_map(
        _with_bn_axis(step, _bn_axis_for(cfg, axis)),
        mesh=mesh,
        in_specs=(P(), P(axis)),
        out_specs=(P(), P()),
        check_vma=False,
    )
    fn = jax.jit(sharded, donate_argnums=0)
    fn.sharded = sharded  # see make_advmix_step: fused-prep callers
    return fn


def bottomup_infer_fn(model, cfg, flip_pairs, max_peaks: int = 30,
                      scales=(1.0,)):
    """Pure bottom-up inference: `infer(params, batch_stats, image) ->
    (heat, tags, peaks)` — forward (+ flip TTA), aggregate output scales,
    extract top-k peaks on device; host-side grouping consumes the outputs
    (evaluation/grouping.py). Shared by `make_bottomup_eval_step` (which
    wraps it in shard_map) and the AOT serving export (tools/export.py).

    `scales` beyond (1.0,) enables the published HigherHRNet MULTI-SCALE
    test protocol (e.g. [0.5, 1, 2]): the input is resized per test scale
    on device, each scale's (flip-averaged) heatmaps are projected to the
    scale-1 aggregation resolution and averaged across scales; the tag
    vectors come from scale 1 only (the published convention — tags at
    other scales live in unaligned embedding spaces). One jitted program
    runs all scales; shapes stay static per scale."""
    from ..ops.ae import aggregate_heatmaps, top_k_peaks
    from ..ops.transforms import flip_back

    flip_test = cfg.TEST.FLIP_TEST
    pairs = tuple(tuple(p) for p in flip_pairs)
    input_size = int(cfg.MODEL.IMAGE_SIZE[0])
    scales = tuple(float(s) for s in scales)
    assert 1.0 in scales, "the base test scale 1 is required"

    def one_scale(variables, image, target_hw, with_tags: bool):
        """Flip-averaged heatmaps at target_hw; stacked tag vectors when
        with_tags (scale 1 only)."""
        outs = model.apply(variables, image, train=False)
        hw = target_hw or (outs[-1].shape[1], outs[-1].shape[2])
        heat, tags = aggregate_heatmaps(outs, hw)
        if flip_test:
            outs_f = model.apply(variables, image[:, :, ::-1, :],
                                 train=False)
            heat_f, tags_f = aggregate_heatmaps(outs_f, hw)
            heat = (heat + flip_back(heat_f, pairs)) * 0.5
            # published HigherHRNet flip protocol: the flipped pass's
            # tagmaps are flipped back (spatial mirror + paired-joint
            # channel swap — the same transform heatmaps get) and STACKED
            # as a second tag dimension; grouping distance becomes the L2
            # norm over the (unflipped, flipped) tag vector. Averaging
            # would mix distinct embedding spaces; dropping them (as before
            # VERDICT r3 item #3) discards half the tag evidence.
            tags = jnp.stack([tags, flip_back(tags_f, pairs)], axis=-1)
        return heat, hw, (tags if with_tags else None)

    def infer(params, batch_stats, img):
        variables = {"params": params, "batch_stats": batch_stats}
        b = img.shape[0]
        # scale 1 first: it fixes the aggregation resolution and owns tags
        heat, target_hw, tags = one_scale(variables, img, None, True)
        if len(scales) > 1:
            heat_sum = heat
            for s in sorted(scales, reverse=True):
                if s == 1.0:
                    continue
                size = int(input_size * s)
                img_s = jax.image.resize(
                    img, (b, size, size, img.shape[3]), method="linear"
                )
                h_s, _, _ = one_scale(variables, img_s, target_hw, False)
                heat_sum = heat_sum + h_s
            heat = heat_sum / float(len(scales))
        peaks = top_k_peaks(heat, tags, k=max_peaks)
        return heat, tags, peaks

    return infer


def make_bottomup_eval_step(model, cfg, flip_pairs, mesh: Mesh,
                            max_peaks: int = 30, axis: str = "data",
                            scales=(1.0,)):
    """`bottomup_infer_fn` wrapped over the data mesh (see its docstring)."""
    axis = data_axes(mesh, axis)  # ("dcn", "data") on multi-slice meshes
    infer = bottomup_infer_fn(model, cfg, flip_pairs, max_peaks, scales)

    def step(params, batch_stats, batch):
        return infer(params, batch_stats, batch["image"])

    sharded = jax.shard_map(
        step,
        mesh=mesh,
        in_specs=(P(), P(), P(axis)),
        out_specs=(P(axis), P(axis), P(axis)),
        check_vma=False,
    )
    return jax.jit(sharded)


def make_bottomup_advmix_step(
    model_d,
    model_g,
    tx_d,
    tx_g,
    cfg,
    mesh: Mesh,
    alpha: float = 0.1,
    adv_loss_weight: float = 1.0,
    num_views: int = 3,
    pull_factor: float = 0.001,
    push_factor: float = 0.001,
    axis: str = "data",
    teacher_apply=None,
):
    """AdvMix min-max for the bottom-up family (BASELINE config #5:
    HigherHRNet-W32 512x512 AdvMix). Same structure as the top-down
    make_advmix_step — G mixes the 3 views, D updates on the stop-gradient
    mix with a KD term against the frozen teacher, G updates adversarially
    through the saved vjp — but D's loss is the bottom-up composite
    (per-scale heatmap MSE + AE pull/push) and the KD term matches D's
    multi-scale heatmaps to the teacher's.

    `teacher_apply(variables, images) -> outs` overrides the teacher
    forward — the int8 teacher lever, as in make_advmix_step."""
    if teacher_apply is None:
        def teacher_apply(variables, images):
            return model_d.apply(variables, images, train=False)
    axis = data_axes(mesh, axis)  # ("dcn", "data") on multi-slice meshes
    from ..ops.ae import ae_loss, bottomup_heatmap_loss, generate_bottomup_target

    num_joints = cfg.MODEL.NUM_JOINTS
    input_size = int(cfg.MODEL.IMAGE_SIZE[0])
    sigma = float(cfg.MODEL.SIGMA)

    def pose_loss(outs, joints, vis, mask):
        total = 0.0
        pull = push = 0.0
        for si, out in enumerate(outs):
            ratio = out.shape[1] / input_size
            tgt, locs = generate_bottomup_target(
                joints * ratio, vis, (out.shape[2], out.shape[1]), sigma
            )
            total = total + bottomup_heatmap_loss(
                out[..., :num_joints], tgt,
                mask=_mask_at(mask, out.shape[1], out.shape[2]),
            )
            if si == 0:
                pull, push = ae_loss(out[..., num_joints:], locs, vis)
        return total + pull_factor * pull + push_factor * push

    def kd_loss(outs, teacher_outs, mask):
        # ignore regions carry no supervision signal for the KD term
        # either: the teacher's predictions there describe unannotated
        # people, the same content the GT mask excludes
        total = 0.0
        for out, tout in zip(outs, teacher_outs):
            total = total + bottomup_heatmap_loss(
                out[..., :num_joints],
                lax.stop_gradient(tout[..., :num_joints]),
                mask=_mask_at(mask, out.shape[1], out.shape[2]),
            )
        return total

    def step(state, batch):
        views = batch["views"]
        clean = views[..., :3]
        joints = batch["joints"]
        vis = batch["joints_vis"]
        mask = batch.get("mask")

        def g_forward(pg):
            logits = model_g.apply({"params": pg}, views)
            w = jax.nn.softmax(logits, axis=-1)
            mixed = jnp.zeros_like(clean)
            for k in range(num_views):
                mixed = mixed + views[..., 3 * k : 3 * k + 3] * w[..., k : k + 1]
            return mixed

        mixed, g_vjp = jax.vjp(g_forward, state.params_g)
        mixed_sg = lax.stop_gradient(mixed)

        teacher_outs = teacher_apply(
            {"params": state.params_t, "batch_stats": state.batch_stats_t},
            clean,
        )

        def loss_d_fn(pd):
            outs, mut = model_d.apply(
                {"params": pd, "batch_stats": state.batch_stats_d},
                mixed_sg, train=True, mutable=["batch_stats"],
            )
            loss = (
                pose_loss(outs, joints, vis, mask) * (1.0 - alpha)
                + kd_loss(outs, teacher_outs, mask) * alpha
            )
            return loss, mut["batch_stats"]

        (loss_d, stats_after_d), grads_d = jax.value_and_grad(
            loss_d_fn, has_aux=True
        )(state.params_d)
        grads_d = lax.pmean(grads_d, axis)
        stats_after_d = lax.pmean(stats_after_d, axis)
        upd_d, new_opt_d = tx_d.update(grads_d, state.opt_state_d, state.params_d)
        new_params_d = optax.apply_updates(state.params_d, upd_d)

        def loss_g_fn(mixed_in):
            outs, mut = model_d.apply(
                {"params": new_params_d, "batch_stats": stats_after_d},
                mixed_in, train=True, mutable=["batch_stats"],
            )
            loss = -pose_loss(outs, joints, vis, mask) * adv_loss_weight
            return loss, mut["batch_stats"]

        (loss_g, stats_after_g), dmixed = jax.value_and_grad(
            loss_g_fn, has_aux=True
        )(mixed)
        stats_after_g = lax.pmean(stats_after_g, axis)
        (grads_g,) = g_vjp(dmixed)
        grads_g = lax.pmean(grads_g, axis)
        upd_g, new_opt_g = tx_g.update(grads_g, state.opt_state_g, state.params_g)
        new_params_g = optax.apply_updates(state.params_g, upd_g)

        metrics = {
            "loss_d": lax.pmean(loss_d, axis),
            "loss_g": lax.pmean(loss_g, axis),
            "acc": lax.pmean(jnp.zeros(()), axis),
            "acc_cnt": lax.psum(jnp.zeros((), jnp.int32), axis),
        }
        new_state = state.replace(
            params_d=new_params_d,
            batch_stats_d=stats_after_g,
            opt_state_d=new_opt_d,
            params_g=new_params_g,
            opt_state_g=new_opt_g,
            step=state.step + 1,
        )
        return new_state, metrics

    sharded = jax.shard_map(
        _with_bn_axis(step, _bn_axis_for(cfg, axis)),
        mesh=mesh,
        in_specs=(P(), P(axis)),
        out_specs=(P(), P()),
        check_vma=False,
    )
    fn = jax.jit(sharded, donate_argnums=0)
    fn.sharded = sharded  # see make_advmix_step: fused-prep callers
    return fn
