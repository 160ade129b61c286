"""Serving-export CLI: ahead-of-time export of the inference function.

The reference ships raw weights only (`final_state.pth`,
`tools/train.py:331-337`). TPU-native deployment wants a compiled
artifact: this exports the pose network's inference step (forward +
optional flip-test ensemble + fused decode to (B, J, 3) predictions in
heatmap coords) as a serialized StableHLO module via `jax.export` —
loadable in any process with `jax.export.deserialize(...).call(...)`,
no model code required — alongside an orbax copy of the weights.

Bottom-up configs (pose_higher_hrnet) export the device half of
`validate_bottomup` instead: a dict of aggregated heatmaps, stacked
flip tags, and top-k peak tensors (+ the published multi-scale protocol
when TEST.SCALE_FACTOR lists >1 scale); host-side grouping
(`evaluation.grouping.parse_bottomup`) consumes the outputs.

Usage:
  python tools/export.py --cfg <yaml> TEST.MODEL_FILE <ckpt> \
      [--batch 128] [--out DIR]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

if os.environ.get("ADVMIX_PLATFORM"):
    import jax as _jax

    _jax.config.update("jax_platforms", os.environ["ADVMIX_PLATFORM"])

from _parse import parse_args  # noqa: E402


def build_infer_fn(model, cfg, flip_pairs):
    """Self-contained inference fn: normalized images -> (preds, maxvals)
    stacked as (B, J, 3) [x, y, score] in heatmap coordinates (host maps
    to original image coords with center/scale via transform_preds)."""
    import jax.numpy as jnp

    from advmix_tpu.ops.heatmap import get_max_preds, quarter_offset
    from advmix_tpu.ops.transforms import flip_back, shift_heatmap_right

    flip_test = cfg.TEST.FLIP_TEST
    shift = cfg.TEST.SHIFT_HEATMAP
    post = cfg.TEST.POST_PROCESS
    pairs = tuple(tuple(p) for p in flip_pairs)

    def infer(params, batch_stats, image):
        variables = {"params": params, "batch_stats": batch_stats}
        out = model.apply(variables, image, train=False)
        if flip_test:
            out_f = model.apply(variables, image[:, :, ::-1, :], train=False)
            out_f = flip_back(out_f, pairs)
            if shift:
                out_f = shift_heatmap_right(out_f)
            out = (out + out_f) * 0.5
        coords, maxvals = get_max_preds(out)
        if post:
            coords = quarter_offset(out, coords)
        return jnp.concatenate([coords, maxvals], axis=-1)  # (B, J, 3)

    return infer


def main(argv=None):
    import argparse

    extra = argparse.ArgumentParser(add_help=False)
    extra.add_argument("--batch", type=int, default=128,
                       help="serving batch size; 0 exports a batch-"
                            "POLYMORPHIC module (symbolic leading dim)")
    extra.add_argument("--out", type=str, default="")
    extra.add_argument("--int8", action="store_true",
                       help="export a W8A8 int8-conv module (ops/quant.py);"
                            " ~2x MXU rate on TPU v5e")
    extra.add_argument("--calib", type=str, default="",
                       help="npy of NORMALIZED images (N,H,W,3) float32 for"
                            " int8 calibration; default: dataset val"
                            " batches, else standard-normal synthetic")
    extra_args, rest = extra.parse_known_args(argv)
    args = parse_args(rest)

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import export as jexport

    from advmix_tpu.config import get_default_config, update_config
    from advmix_tpu import models
    from advmix_tpu.engine.checkpoint import (
        export_final_state,
        load_torch_checkpoint,
    )
    from advmix_tpu.utils.logging import create_logger

    cfg = get_default_config()
    update_config(cfg, args)
    logger, output_dir, _ = create_logger(cfg, args.cfg, "export")
    out_dir = extra_args.out or os.path.join(output_dir, "export")
    os.makedirs(out_dir, exist_ok=True)

    dtype = (jnp.bfloat16
             if (args.dtype or cfg.TRAIN.DTYPE) == "bfloat16"
             else jnp.float32)
    model = models.get_pose_net(cfg, dtype=dtype)
    w, h = cfg.MODEL.IMAGE_SIZE
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((2, h, w, 3)), train=False
    )
    model_file = cfg.TEST.MODEL_FILE
    if model_file and model_file.endswith(".pth"):
        variables = load_torch_checkpoint(model_file, dict(variables))
        logger.info(f"=> loaded torch model {model_file}")
    elif model_file and os.path.isdir(model_file):
        from advmix_tpu.engine.checkpoint import load_final_state

        variables = load_final_state(model_file, dict(variables))
        logger.info(f"=> loaded model {model_file}")
    else:
        logger.warning("=> no TEST.MODEL_FILE; exporting random init")

    bottomup = cfg.MODEL.NAME == "pose_higher_hrnet"

    # flip pairs come from the dataset family; the dataset is reused for
    # int8 calibration below (COCO annotation parsing is expensive)
    from advmix_tpu.data import build_dataset

    ds = None
    try:
        ds = build_dataset(cfg, is_train=False)
        flip_pairs = ds.flip_pairs
    except Exception:
        if bottomup:
            # class-level COCO pairs — no annotation files needed
            from advmix_tpu.data.bottomup import BottomUpCOCODataset

            flip_pairs = BottomUpCOCODataset.flip_pairs
        else:
            flip_pairs = []
            logger.warning(
                "=> dataset unavailable; exporting without flip pairs")

    if extra_args.int8 and bottomup:
        raise ValueError(
            "--int8 is a top-down (wide-channel) win; it MEASURES 18% "
            "slower than bf16 on HigherHRNet-512's C=32-dominated convs "
            "(PERF.md) — export bottom-up modules in bf16"
        )
    if extra_args.int8:
        # W8A8 int8 export (TPU-native extension): per-channel int8
        # weights + calibrated per-tensor activation scales baked into
        # the StableHLO module as constants; the MXU runs the convs at
        # int8 rate (measured ~1.7x bf16 end-to-end on v5e shapes).
        from advmix_tpu.ops.quant import (
            calibrate_act_scales,
            calibrate_from_loader,
            quantized_model_view,
        )

        if dict(cfg.MODEL.EXTRA).get("USE_SCAN", False):
            raise ValueError(
                "--int8 needs MODEL.EXTRA.USE_SCAN: false — calibration "
                "runs eagerly and scanned bodies trace (ops/quant.py)"
            )
        if extra_args.calib:
            arr = np.load(extra_args.calib).astype(np.float32)
            calib = [jnp.asarray(arr[i : i + 16]) for i in range(0, len(arr), 16)]
            act_scales = calibrate_act_scales(model, variables, calib)
        elif ds is not None:
            from advmix_tpu.data import Loader

            act_scales = calibrate_from_loader(
                model, variables, Loader(ds, 16, shuffle=False), 2,
            )
        else:
            logger.warning(
                "=> --int8: no dataset/--calib; calibrating on "
                "standard-normal synthetic images (ranges may be loose)"
            )
            rng = np.random.RandomState(0)
            act_scales = calibrate_act_scales(
                model, variables,
                [jnp.asarray(rng.randn(16, h, w, 3).astype(np.float32))],
            )
        # pre-quantize kernels IN the weight artifact (4x smaller; the
        # per-channel scales become constants of the exported module)
        from advmix_tpu.ops.quant import prequantize_params

        qparams, w_scales = prequantize_params(
            variables["params"], act_scales
        )
        variables = dict(variables)
        variables["params"] = qparams
        model = quantized_model_view(model, act_scales, w_scales=w_scales)
        logger.info(
            f"=> int8: {len(act_scales)} convs calibrated; "
            f"{len(w_scales)} kernels stored int8 "
            "(NOTE: this final_state is a serving artifact — it does not "
            "load into the f32 model)"
        )

    if bottomup:
        # bottom-up serving module: forward (+ flip TTA, + the published
        # multi-scale protocol when TEST.SCALE_FACTOR lists >1 scale),
        # aggregated heatmaps/tags and top-k peaks — exactly the device
        # half of validate_bottomup; host-side grouping
        # (evaluation/grouping.parse_bottomup) consumes the outputs.
        from advmix_tpu.engine.steps import bottomup_infer_fn

        base = bottomup_infer_fn(
            model, cfg, flip_pairs,
            scales=tuple(float(s) for s in cfg.TEST.SCALE_FACTOR))

        def infer(params, batch_stats, image):
            heat, tags, peaks = base(params, batch_stats, image)
            return {"heat": heat, "tags": tags,
                    "peak_x": peaks["x"], "peak_y": peaks["y"],
                    "peak_val": peaks["val"], "peak_tag": peaks["tag"]}
    else:
        infer = build_infer_fn(model, cfg, flip_pairs)
    b = extra_args.batch

    def fn(params, batch_stats, image):
        return infer(params, batch_stats, image)

    if b == 0:
        # batch-polymorphic export: one serialized module serves ANY
        # batch size (shape-polymorphic StableHLO via jax.export
        # symbolic dims) — the serving-side answer to variable request
        # batching, with no per-size recompilation artifacts to manage
        (batch_dim,) = jexport.symbolic_shape("b")
        img_spec = jax.ShapeDtypeStruct((batch_dim, h, w, 3), jnp.float32)
        batch_desc = "polymorphic"
    else:
        img_spec = jax.ShapeDtypeStruct((b, h, w, 3), jnp.float32)
        batch_desc = str(b)
    exported = jexport.export(jax.jit(fn))(
        jax.tree.map(lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype),
                     variables["params"]),
        jax.tree.map(lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype),
                     variables.get("batch_stats", {})),
        img_spec,
    )
    blob = exported.serialize()
    path = os.path.join(out_dir, "pose_infer.stablehlo")
    with open(path, "wb") as f:
        f.write(blob)
    logger.info(
        f"=> exported AOT inference module ({len(blob)/1e6:.1f} MB, "
        f"batch {batch_desc}, {w}x{h}) to {path}"
    )
    wpath = export_final_state(out_dir, jax.device_get(variables))
    logger.info(f"=> weights exported to {wpath}")

    # round-trip smoke: deserialize and run one batch
    def _shapes(out):
        return jax.tree.map(lambda a: tuple(np.asarray(a).shape), out)

    rt = jexport.deserialize(bytearray(blob))
    rb = 4 if b == 0 else b
    out = rt.call(variables["params"], variables.get("batch_stats", {}),
                  jnp.zeros((rb, h, w, 3), jnp.float32))
    logger.info(f"=> round-trip OK: output {_shapes(out)}")
    if b == 0:
        out2 = rt.call(variables["params"],
                       variables.get("batch_stats", {}),
                       jnp.zeros((7, h, w, 3), jnp.float32))
        logger.info(
            f"=> polymorphic round-trip OK at batch 7: {_shapes(out2)}"
        )


if __name__ == "__main__":
    main()
