"""Serving-throughput benchmark: the production eval step, bf16 vs int8.

Measures the same program `tools/test_corruption.py` / `tools/serve.py`
run in production (model forward + optional flip-test ensemble + decode)
at a fixed batch size, and prints one JSON line per run — the source of
the serving numbers in PERF.md / README.md (2739 bf16 / 3064 int8 /
3155 int8-prequant img/s on one v5e chip at HRNet-W32 256x192).

No reference equivalent: the reference evaluates via its torch val loop
only (`lib/core/function.py:200-318`).

Usage:
  python tools/serving_bench.py --cfg <yaml> [--arm bf16|int8|int8pre]
      [--batch 128] [--steps 20]

Notes:
- int8 arms calibrate on random images here (throughput is range-
  independent); accuracy-bearing runs calibrate on real batches
  (`TEST.INT8`, `tools/export.py --int8`).
- Timing: two windows of `--steps` dispatches with one device sync per
  window, best-of — see PERF.md on why single short windows lie through
  the relay tunnel.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

if os.environ.get("ADVMIX_PLATFORM"):
    import jax as _jax

    _jax.config.update("jax_platforms", os.environ["ADVMIX_PLATFORM"])

from _parse import parse_args  # noqa: E402


def main(argv=None):
    import argparse

    extra = argparse.ArgumentParser(add_help=False)
    extra.add_argument("--arm", default="bf16",
                       choices=["bf16", "int8", "int8pre"])
    extra.add_argument("--batch", type=int, default=128)
    extra.add_argument("--steps", type=int, default=20)
    extra_args, rest = extra.parse_known_args(argv)
    args = parse_args(rest)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from advmix_tpu.config import get_default_config, update_config
    from advmix_tpu import models
    from advmix_tpu.engine import steps
    from advmix_tpu.ops.heatmap import generate_target
    from advmix_tpu.parallel import get_mesh, device_put_batch
    from advmix_tpu.parallel.mesh import replicate

    cfg = get_default_config()
    update_config(cfg, args)
    # EVERY arm uses the unscanned construction (int8 needs it for
    # calibration, ops/quant.py; forcing it for bf16 too keeps the
    # int8-vs-bf16 comparison a one-variable experiment — ADVICE r3)
    cfg.defrost()
    extra_cfg = dict(cfg.MODEL.EXTRA)
    extra_cfg["USE_SCAN"] = False
    cfg.MODEL.EXTRA = extra_cfg
    cfg.freeze()

    mesh = get_mesh(args.num_devices or None)
    dtype = (jnp.bfloat16
             if (args.dtype or cfg.TRAIN.DTYPE) == "bfloat16"
             else jnp.float32)
    model = models.get_pose_net(cfg, dtype=dtype)
    w, h = cfg.MODEL.IMAGE_SIZE
    hw, hh = cfg.MODEL.HEATMAP_SIZE
    J = cfg.MODEL.NUM_JOINTS
    B = extra_args.batch

    rng = np.random.RandomState(0)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        vs = model.init(jax.random.PRNGKey(0), jnp.zeros((2, h, w, 3)),
                        train=False)

    if extra_args.arm in ("int8", "int8pre"):
        from advmix_tpu.ops.quant import (
            calibrate_act_scales,
            prequantize_params,
            quantized_model_view,
        )

        calib = jnp.asarray(rng.randn(4, h, w, 3).astype(np.float32))
        with jax.default_device(cpu):
            scales = calibrate_act_scales(model, vs, [calib])
        if extra_args.arm == "int8pre":
            with jax.default_device(cpu):
                qparams, w_scales = prequantize_params(vs["params"], scales)
            vs = dict(vs)
            vs["params"] = qparams
            model = quantized_model_view(model, scales, w_scales=w_scales)
        else:
            model = quantized_model_view(model, scales)

    bottomup = cfg.MODEL.NAME == "pose_higher_hrnet"
    img = jnp.asarray(rng.randn(B, h, w, 3).astype(np.float32))
    if bottomup:
        # bottom-up serving: forward (+flip TTA), multi-scale aggregate,
        # on-device peak extraction; host grouping is excluded (it runs
        # overlapped with the next batch in production validate_bottomup).
        # TEST.SCALE_FACTOR [0.5,1,2] measures the published multi-scale
        # protocol (same knob tools/test_corruption.py serves it by)
        eval_step = steps.make_bottomup_eval_step(
            model, cfg, [[1, 2]], mesh,
            scales=tuple(cfg.TEST.SCALE_FACTOR))
        batch = device_put_batch({"image": img}, mesh)
    else:
        eval_step = steps.make_eval_step(model, cfg, [[1, 2]], mesh)
        joints = jnp.asarray(
            rng.uniform(0, min(w, h) - 2, (B, J, 2)).astype(np.float32))
        vis = jnp.ones((B, J), jnp.float32)
        target, _, tw = generate_target(joints, vis, (w, h), (hw, hh),
                                        float(cfg.MODEL.SIGMA))
        batch = device_put_batch(
            {"image": img, "target": target, "target_weight": tw,
             "center": jnp.asarray(
                 rng.uniform(100, 200, (B, 2)).astype(np.float32)),
             "scale": jnp.asarray(
                 rng.uniform(0.8, 1.5, (B, 2)).astype(np.float32))},
            mesh)
    params = replicate(vs["params"], mesh)
    stats = replicate(vs.get("batch_stats", {}), mesh)

    def sync(outs):
        # force a REAL device sync by transferring a small output —
        # block_until_ready does not wait through the async relay
        # (PERF.md methodology note). Top-down: the (B, J, 3) preds;
        # bottom-up: the top-k peaks (the heatmaps are large).
        jax.device_get(outs[-1] if bottomup else outs[0])

    t0 = time.perf_counter()
    outs = eval_step(params, stats, batch)
    sync(outs)
    compile_s = time.perf_counter() - t0

    windows = []
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(extra_args.steps):
            outs = eval_step(params, stats, batch)
        sync(outs)
        windows.append(B * extra_args.steps / (time.perf_counter() - t0))
    print(json.dumps({
        "metric": f"{cfg.MODEL.NAME} {w}x{h} eval/serving throughput "
                  f"({extra_args.arm}, batch {B}, flip_test="
                  f"{bool(cfg.TEST.FLIP_TEST)}"
                  + (f", scales={list(cfg.TEST.SCALE_FACTOR)}"
                     if bottomup and len(cfg.TEST.SCALE_FACTOR) > 1
                     else "") + ")",
        "value": round(max(windows), 1),
        "unit": "img/s",
        "ms_per_batch": round(B / max(windows) * 1e3, 2),
        "windows": [round(x, 1) for x in windows],
        "compile_s": round(compile_s, 1),
    }))


if __name__ == "__main__":
    main()
