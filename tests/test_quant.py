"""int8 post-training quantization (ops/quant.py).

Net-new beyond the reference (fp32 serving only): W8A8 conv inference
with per-channel weight scales and calibrated per-tensor activation
scales, swapped in via a flax method interceptor (no model changes).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from flax import linen as nn

from advmix_tpu.ops import quant
from advmix_tpu.models.pose_resnet import PoseResNet


class _TinyNet(nn.Module):
    @nn.compact
    def __call__(self, x, train=False):
        x = nn.Conv(16, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                    use_bias=False, name="stem")(x)
        x = nn.relu(x)
        x = nn.Conv(16, (3, 3), padding=((1, 1), (1, 1)), use_bias=True,
                    name="mid")(x)
        x = nn.relu(x)
        x = nn.Conv(4, (1, 1), use_bias=True, name="final_layer")(x)
        return x


def _tiny():
    m = _TinyNet()
    x = jnp.asarray(
        np.random.RandomState(0).uniform(-2, 2, (2, 16, 12, 3)).astype(np.float32)
    )
    vs = m.init(jax.random.PRNGKey(0), x)
    return m, vs, x


def test_quantize_weight_roundtrip():
    w = jnp.asarray(
        np.random.RandomState(1).normal(0, 0.3, (3, 3, 8, 16)).astype(np.float32)
    )
    wq, scale = quant.quantize_weight(w)
    assert wq.dtype == jnp.int8 and scale.shape == (16,)
    deq = wq.astype(jnp.float32) * scale
    # symmetric round-to-nearest: error <= scale/2 per element
    err = np.abs(np.asarray(deq - w))
    assert (err <= np.asarray(scale) * 0.5 + 1e-7).all()


def test_quantized_tiny_model_close_and_jit_consistent():
    m, vs, x = _tiny()
    ref = m.apply(vs, x)
    scales = quant.calibrate_act_scales(m, vs, [x], apply_kwargs={})
    assert set(scales) == {"stem", "mid"}  # final_layer skipped by default
    qapply = quant.make_quantized_apply(m, scales)
    out = qapply(vs, x)
    rel = float(jnp.max(jnp.abs(out - ref))) / float(jnp.max(jnp.abs(ref)))
    assert rel < 0.03, rel
    out_j = jax.jit(qapply)(vs, x)
    np.testing.assert_allclose(np.asarray(out_j), np.asarray(out), atol=1e-5)


def test_skip_everything_is_exact():
    m, vs, x = _tiny()
    ref = m.apply(vs, x)
    qapply = quant.make_quantized_apply(m, {}, skip=lambda p: True)
    np.testing.assert_array_equal(np.asarray(qapply(vs, x)), np.asarray(ref))


def test_calibration_aggregates_and_percentile():
    m, vs, _ = _tiny()
    rng = np.random.RandomState(2)
    b1 = jnp.asarray(rng.uniform(-1, 1, (2, 16, 12, 3)).astype(np.float32))
    b2 = jnp.asarray(rng.uniform(-4, 4, (2, 16, 12, 3)).astype(np.float32))
    s1 = quant.calibrate_act_scales(m, vs, [b1], apply_kwargs={})
    s12 = quant.calibrate_act_scales(m, vs, [b1, b2], apply_kwargs={})
    assert s12["stem"] > s1["stem"]  # wider batch widened the range
    sp = quant.calibrate_act_scales(
        m, vs, [b1, b2], method="percentile", percentile=99.0, apply_kwargs={}
    )
    # a percentile clips the tail, so its scale is <= absmax's
    assert sp["stem"] <= s12["stem"] + 1e-9


def test_scanned_model_calibration_raises():
    # resnet-34: layers have >2 blocks, so use_scan actually scans
    model = PoseResNet(num_layers=34, num_joints=5, use_scan=True)
    x = jnp.zeros((1, 64, 48, 3))
    vs = model.init(jax.random.PRNGKey(0), x, train=False)
    with pytest.raises(ValueError, match="USE_SCAN"):
        quant.calibrate_act_scales(model, vs, [x])


def test_quantized_pose_resnet18():
    model = PoseResNet(num_layers=18, num_joints=5)
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.uniform(-2, 2, (2, 64, 48, 3)).astype(np.float32))
    vs = model.init(jax.random.PRNGKey(0), x, train=False)
    # randomize running stats so eval-mode BN is non-trivial (means near
    # 0, vars near 1 — large mean shifts would saturate every ReLU and
    # zero the whole output)
    stats_rng = np.random.RandomState(11)
    vs = dict(vs)
    vs["batch_stats"] = jax.tree_util.tree_map_with_path(
        lambda path, a: jnp.asarray(
            (stats_rng.randn(*a.shape) * 0.1
             if path[-1].key == "mean"
             else stats_rng.uniform(0.5, 1.5, a.shape)).astype(np.float32)),
        vs["batch_stats"],
    )
    ref = model.apply(vs, x, train=False)
    scales = quant.calibrate_act_scales(model, vs, [x])
    assert len(scales) > 10
    qapply = quant.make_quantized_apply(model, scales)
    out = qapply(vs, x, train=False)
    denom = float(jnp.max(jnp.abs(ref)))
    rel = float(jnp.max(jnp.abs(out - ref))) / denom
    assert rel < 0.08, rel
    # the bulk of the map should be much closer than the worst pixel
    mean_rel = float(jnp.mean(jnp.abs(out - ref))) / denom
    assert mean_rel < 0.01, mean_rel


def test_quantized_view_exports_and_roundtrips():
    from jax import export as jexport

    m, vs, x = _tiny()
    scales = quant.calibrate_act_scales(m, vs, [x], apply_kwargs={})
    view = quant.quantized_model_view(m, scales)

    def fn(params, image):
        return view.apply({"params": params}, image)

    exported = jexport.export(jax.jit(fn))(
        jax.tree.map(lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype),
                     vs["params"]),
        jax.ShapeDtypeStruct(x.shape, x.dtype),
    )
    rt = jexport.deserialize(bytearray(exported.serialize()))
    out = rt.call(vs["params"], x)
    direct = fn(vs["params"], x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(direct), atol=1e-5)


def test_quantized_eval_step_on_mesh():
    """The quantized view drops into make_eval_step unchanged: the
    interceptor rewrites convs inside the shard_map-jitted program on
    the 8-device mesh, and predictions stay close to the f32 step's."""
    from advmix_tpu.config import load_config
    from advmix_tpu.engine import steps
    from advmix_tpu.ops.heatmap import generate_target
    from advmix_tpu.parallel import get_mesh, device_put_batch
    from advmix_tpu.parallel.mesh import replicate

    B, J = 16, 4
    cfg = load_config()
    cfg.defrost()
    cfg.MODEL.NUM_JOINTS = J
    cfg.MODEL.IMAGE_SIZE = [64, 64]
    cfg.MODEL.HEATMAP_SIZE = [16, 16]
    cfg.TEST.FLIP_TEST = True
    cfg.TEST.POST_PROCESS = True
    cfg.freeze()
    mesh = get_mesh(8)
    model = PoseResNet(num_layers=18, num_joints=J,
                       num_deconv_filters=(64, 64, 64))
    rng = np.random.RandomState(5)
    img = rng.randn(B, 64, 64, 3).astype(np.float32)
    vs = model.init(jax.random.PRNGKey(0), jnp.zeros((2, 64, 64, 3)),
                    train=False)
    scales = quant.calibrate_act_scales(model, vs, [jnp.asarray(img)])
    view = quant.quantized_model_view(model, scales)

    joints = rng.uniform(5, 59, (B, J, 2)).astype(np.float32)
    vis = np.ones((B, J), np.float32)
    tgt, _, w = generate_target(jnp.asarray(joints), jnp.asarray(vis),
                                (64, 64), (16, 16), 2)
    batch = device_put_batch(
        {"image": jnp.asarray(img), "target": tgt, "target_weight": w,
         "center": jnp.asarray(rng.uniform(100, 200, (B, 2)).astype(np.float32)),
         "scale": jnp.asarray(rng.uniform(0.8, 1.5, (B, 2)).astype(np.float32))},
        mesh,
    )
    params = replicate(vs["params"], mesh)
    stats = replicate(vs.get("batch_stats", {}), mesh)

    f32_step = steps.make_eval_step(model, cfg, [[0, 1]], mesh)
    q_step = steps.make_eval_step(view, cfg, [[0, 1]], mesh)
    preds_f, maxv_f, _ = f32_step(params, stats, batch)
    preds_q, maxv_q, _ = q_step(params, stats, batch)
    assert preds_q.shape == (B, J, 2)
    # heatmap peaks of a random-init net are diffuse; demand score
    # agreement and that most decoded peaks coincide
    np.testing.assert_allclose(np.asarray(maxv_q), np.asarray(maxv_f),
                               atol=0.05)
    close = np.linalg.norm(
        np.asarray(preds_q) - np.asarray(preds_f), axis=-1) < 2.0
    assert close.mean() > 0.75, close.mean()


def test_prequantized_params_match_onthefly():
    """prequantize_params + w_scales reproduces the on-the-fly quantized
    forward bit-for-bit (same wq, same scales), with int8 kernels in the
    tree (4x smaller serving weights)."""
    m, vs, x = _tiny()
    scales = quant.calibrate_act_scales(m, vs, [x], apply_kwargs={})
    ref = quant.make_quantized_apply(m, scales)(vs, x)

    qparams, w_scales = quant.prequantize_params(vs["params"], scales)
    assert set(w_scales) == {"stem", "mid"}
    assert qparams["stem"]["kernel"].dtype == jnp.int8
    assert qparams["final_layer"]["kernel"].dtype == jnp.float32  # skipped
    # original tree untouched
    assert vs["params"]["stem"]["kernel"].dtype == jnp.float32

    qapply = quant.make_quantized_apply(m, scales, w_scales=w_scales)
    out = qapply({"params": qparams}, x)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_int8_kernel_without_scale_raises():
    m, vs, x = _tiny()
    scales = quant.calibrate_act_scales(m, vs, [x], apply_kwargs={})
    qparams, _ = quant.prequantize_params(vs["params"], scales)
    qapply = quant.make_quantized_apply(m, scales)  # no w_scales
    with pytest.raises(ValueError, match="weight scale"):
        qapply({"params": qparams}, x)


def test_polymorphic_int8_export_no_train_kwarg():
    """Batch-polymorphic int8 export, on a model whose __call__ takes no
    `train` kwarg (apply_kwargs={} must not inject one — regression)."""
    from jax import export as jexport

    class Plain(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = nn.Conv(8, (3, 3), padding=((1, 1), (1, 1)), name="c1")(x)
            return nn.Conv(4, (1, 1), name="final_layer")(x)

    m = Plain()
    x = jnp.asarray(
        np.random.RandomState(0).randn(2, 16, 12, 3).astype(np.float32))
    vs = m.init(jax.random.PRNGKey(0), x)
    scales = quant.calibrate_act_scales(m, vs, [x], apply_kwargs={})
    qp, ws = quant.prequantize_params(vs["params"], scales)
    view = quant.quantized_model_view(m, scales, w_scales=ws)
    (b,) = jexport.symbolic_shape("b")
    e = jexport.export(
        jax.jit(lambda p, img: view.apply({"params": p}, img)))(
        jax.tree.map(lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), qp),
        jax.ShapeDtypeStruct((b, 16, 12, 3), jnp.float32))
    rt = jexport.deserialize(bytearray(e.serialize()))
    for n in (3, 7):
        out = rt.call(qp, jnp.zeros((n, 16, 12, 3), jnp.float32))
        assert np.asarray(out).shape == (n, 16, 12, 4)


@pytest.mark.slow
def test_int8_teacher_in_advmix_step():
    """TRAIN.INT8_TEACHER (net-new perf lever, no reference counterpart):
    the fused AdvMix step runs the frozen teacher forward W8A8 via
    make_int8_teacher_apply. The teacher params come in SCANNED (the
    shipped-YAML layout) and are unstacked inside the trace; the step's
    loss_d and the resulting D update must stay close to the f32-teacher
    step (the KD target moves by int8 rounding only)."""
    from advmix_tpu.config import load_config
    from advmix_tpu.engine import optim, state as state_lib, steps
    from advmix_tpu.models.pose_hrnet import PoseHighResolutionNet
    from advmix_tpu.models.torch_convert import is_scanned, unstack_from_scan
    from advmix_tpu.models.unet import UnetGenerator
    from advmix_tpu.ops.augment import make_advmix_views
    from advmix_tpu.ops.heatmap import generate_target
    from advmix_tpu.parallel import get_mesh, device_put_batch
    from advmix_tpu.parallel.mesh import replicate

    # >1 identical blocks/modules so the scanned construction actually
    # scans (pose_hrnet engages lax.scan only for nb > 1 / n_same > 1)
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
    B, J = 8, 4
    cfg = load_config()
    cfg.defrost()
    cfg.MODEL.NUM_JOINTS = J
    cfg.MODEL.IMAGE_SIZE = [64, 64]
    cfg.MODEL.HEATMAP_SIZE = [16, 16]
    cfg.freeze()
    mesh = get_mesh(8)
    model_d = PoseHighResolutionNet(num_joints=J, use_scan=True, **STAGES)
    model_uns = PoseHighResolutionNet(num_joints=J, use_scan=False, **STAGES)
    model_g = UnetGenerator(output_nc=3, num_downs=6)
    tx_d = optim.get_optimizer(cfg)
    tx_g = optim.get_generator_optimizer(cfg)
    rng = jax.random.PRNGKey(0)
    st0 = state_lib.create_advmix_state(
        model_d, model_g, tx_d, tx_g, rng, jnp.zeros((2, 64, 64, 3)))

    rs = np.random.RandomState(0)
    clean = jnp.asarray(
        rs.randint(0, 256, (B, 64, 64, 3)).astype(np.float32))
    views = make_advmix_views(clean, jax.random.PRNGKey(1))
    joints = jnp.asarray(rs.uniform(5, 59, (B, J, 2)).astype(np.float32))
    vis = jnp.ones((B, J), jnp.float32)
    tgt, _, tw = generate_target(joints, vis, (64, 64), (16, 16), 2.0)
    batch = device_put_batch(
        {"views": views, "target": tgt, "target_weight": tw}, mesh)

    assert is_scanned(st0.params_t)
    vars_t = {
        "params": unstack_from_scan(jax.tree.map(np.asarray, st0.params_t)),
        "batch_stats": unstack_from_scan(
            jax.tree.map(np.asarray, st0.batch_stats_t)),
    }
    scales = quant.calibrate_act_scales(
        model_uns, vars_t, [np.asarray(views[..., :3])])
    assert len(scales) > 10
    t_apply = quant.make_int8_teacher_apply(model_uns, scales)

    step_f32 = steps.make_advmix_step(model_d, model_g, tx_d, tx_g, cfg, mesh)
    step_int8 = steps.make_advmix_step(
        model_d, model_g, tx_d, tx_g, cfg, mesh, teacher_apply=t_apply)

    def fresh():
        return replicate(jax.tree.map(np.copy, st0), mesh)

    st_f, m_f = step_f32(fresh(), batch)
    st_q, m_q = step_int8(fresh(), batch)
    # loss_d differs only through the alpha-weighted KD term's int8
    # rounding of the teacher heatmaps
    np.testing.assert_allclose(
        float(m_q["loss_d"]), float(m_f["loss_d"]), rtol=0.05, atol=1e-4)
    # the D update stays close
    for a, b in zip(jax.tree.leaves(st_q.params_d),
                    jax.tree.leaves(st_f.params_d)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-3)


def test_int8_teacher_from_config_scanned_params():
    """quant.int8_teacher_from_config (the one-stop TRAIN.INT8_TEACHER
    constructor shared by tools/train.py and bench.py): given a config
    whose model scans (USE_SCAN) and SCANNED teacher variables, it must
    clone an unscanned construction, unstack the params, calibrate, and
    return a teacher_apply whose output tracks the f32 forward within
    int8 rounding."""
    from advmix_tpu.config import load_config
    from advmix_tpu.models import get_pose_net
    from advmix_tpu.models.torch_convert import is_scanned

    cfg = load_config(
        "experiments/synthetic/res18_64x64_smoke.yaml",
        ["MODEL.EXTRA.NUM_LAYERS", "34", "MODEL.EXTRA.USE_SCAN", "True"],
    )
    model = get_pose_net(cfg, dtype=jnp.float32)
    rng = np.random.RandomState(11)
    x = jnp.asarray(rng.uniform(-2, 2, (2, 64, 64, 3)).astype(np.float32))
    vs = model.init(jax.random.PRNGKey(0), x, train=False)
    assert is_scanned(vs["params"])  # resnet-34 layers scan for real

    t_apply, scales = quant.int8_teacher_from_config(
        cfg, jnp.float32, vs, calib_images=[np.asarray(x)])
    assert len(scales) > 10
    # the returned apply consumes the ORIGINAL (scanned) variables —
    # unstacking happens in-trace (make_int8_teacher_apply)
    got = np.asarray(t_apply(vs, x))
    want = np.asarray(model.apply(vs, x, train=False))
    assert got.shape == want.shape
    err = np.abs(got - want).mean()
    assert err < 0.05, err
    assert err > 0  # int8 rounding actually happened

    # loader-less misuse raises with a clear message
    with pytest.raises(ValueError, match="calib_images"):
        quant.int8_teacher_from_config(cfg, jnp.float32, vs)
