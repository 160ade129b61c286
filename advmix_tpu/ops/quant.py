"""Post-training int8 quantization (W8A8) for the serving/eval path.

Net-new beyond the reference (which serves torch fp32/fp16 weights,
`tools/train.py:331-337`): TPU v5e's MXU runs int8 at ~2x the bf16 rate
(measured 1.7x end-to-end on production conv shapes through this chip),
so the inference forward can trade <1% heatmap error for a large
throughput win with no model changes.

Design (TPU-first):
- Symmetric int8: per-OUTPUT-CHANNEL weight scales (max|w| / 127 over
  HWI), per-TENSOR activation scales calibrated offline (abs-max or
  percentile over calibration batches). Accumulation in int32 on the
  MXU via `lax.conv_general_dilated(..., preferred_element_type=int32)`,
  rescale to float once per conv.
- Zero model changes: a flax method interceptor (`nn.intercept_methods`)
  substitutes every `nn.Conv.__call__` with the quantized kernel at
  trace time, keyed by the module's scope path. BN / ReLU / residual
  adds stay in the model's compute dtype (they are VPU work and cheap).
- Weights are quantized inside the traced function from the live f32
  params (reading 1x weight bytes per forward -- negligible vs
  activation traffic). This keeps one weight artifact on disk and works
  for scanned (`nn.scan`) modules, whose per-iteration kernels only
  exist inside the scan body.
- `nn.ConvTranspose` (deconv heads) and any conv matched by `skip`
  stay in the original dtype. The final 1x1 heatmap conv is skipped by
  default ("final_layer*"): it sets prediction precision and costs
  little.

Caveats:
- Calibration requires eager (non-jit) execution with concrete values;
  scanned models trace their body, so calibrate with USE_SCAN=False
  (checkpoints load into either naming).
- On a scanned model the per-path activation scale is shared across
  scan iterations (the body traces once). For maximum fidelity quantize
  the unscanned construction; the difference is small on BN-normalized
  trunks, where per-block input ranges are stable.
"""

from __future__ import annotations

import warnings
from typing import Any, Callable, Iterable, Mapping

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax import lax

DEFAULT_SKIP = ("final_layer",)


def _pair(v) -> tuple:
    if isinstance(v, int):
        return (v, v)
    return tuple(v)


def _canon_padding(padding):
    """flax padding shorthand -> lax explicit form (str | int | pair-of-
    ints | pairs). Returns None when unrecognized (caller falls back)."""
    if isinstance(padding, str):
        return padding if padding in ("SAME", "VALID") else None
    if isinstance(padding, int):
        return ((padding, padding),) * 2
    try:
        return tuple(_pair(p) for p in padding)
    except TypeError:
        return None


def _path_of(module: nn.Module) -> str:
    return "/".join(str(p) for p in module.scope.path)


def _make_skip_fn(skip) -> Callable[[str], bool]:
    if skip is None:
        skip = DEFAULT_SKIP
    if callable(skip):
        return skip
    subs = tuple(skip)
    return lambda path: any(s in path for s in subs)


def _supported(mod: nn.Conv) -> bool:
    # int8 path covers the plain 2-D convs the pose models use; anything
    # exotic falls back to the unquantized call.
    if not type(mod) is nn.Conv:  # noqa: E721  (ConvTranspose subclasses differ)
        return False
    if len(tuple(mod.kernel_size)) != 2:  # 1-D/3-D convs: fall back
        return False
    if _canon_padding(mod.padding) is None:
        return False
    if getattr(mod, "mask", None) is not None:
        return False
    if _pair(getattr(mod, "input_dilation", 1) or 1) != (1, 1):
        return False
    return True


def quantize_weight(w: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-output-channel symmetric int8: w ~= wq * scale[None,None,None,:]."""
    absmax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=(0, 1, 2))
    scale = jnp.maximum(absmax, 1e-12) / 127.0
    wq = jnp.clip(jnp.round(w.astype(jnp.float32) / scale), -127, 127)
    return wq.astype(jnp.int8), scale


def quantize_activation(x: jnp.ndarray, scale: float) -> jnp.ndarray:
    xq = jnp.round(x.astype(jnp.float32) * (1.0 / scale))
    return jnp.clip(xq, -127, 127).astype(jnp.int8)


def _quantized_conv(mod: nn.Conv, x: jnp.ndarray, act_scale: float,
                    w_scale=None):
    w = mod.variables["params"]["kernel"]
    bias = mod.variables["params"].get("bias")
    if w.dtype == jnp.int8:
        # pre-quantized checkpoint (prequantize_params): the kernel is
        # already int8 and its per-channel scale is a baked-in constant
        if w_scale is None:
            raise ValueError(
                "int8 kernel without a weight scale — pass the w_scales "
                "mapping from prequantize_params to make_quantized_apply"
            )
        wq = w
        w_scale = jnp.asarray(w_scale, jnp.float32)
    else:
        wq, w_scale = quantize_weight(w)
    xq = quantize_activation(x, act_scale)
    pad = _canon_padding(mod.padding)
    out = lax.conv_general_dilated(
        xq,
        wq,
        window_strides=_pair(mod.strides or 1),
        padding=pad,
        rhs_dilation=_pair(getattr(mod, "kernel_dilation", 1) or 1),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=getattr(mod, "feature_group_count", 1),
        preferred_element_type=jnp.int32,
    )
    out = out.astype(jnp.float32) * (w_scale * act_scale)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    dtype = mod.dtype or x.dtype
    return out.astype(dtype)


# ---------------------------------------------------------------------------
# Calibration
# ---------------------------------------------------------------------------

def calibrate_act_scales(
    model: nn.Module,
    variables: Mapping[str, Any],
    batches: Iterable[jnp.ndarray],
    method: str = "absmax",
    percentile: float = 99.9,
    skip=None,
    apply_kwargs: Mapping[str, Any] | None = None,
    margin: float = 1.0,
) -> dict[str, float]:
    """Run calibration batches eagerly, recording per-conv input ranges.

    Returns {module_path: activation_scale} where scale = range / 127.
    `method`: "absmax" (max over all batches) or "percentile" (given
    percentile of |x| pooled over batches -- clips outliers, usually
    better for post-ReLU long tails).
    `margin` multiplies every scale (>1 leaves saturation headroom when
    serving inputs range wider than the calibration set — e.g. corruption
    sweeps calibrated on clean batches, ADVICE r3 #1 — at the cost of
    coarser rounding on in-range values).

    The absmax path runs as ONE jitted program per batch shape (the
    interceptor records per-conv |x| maxima as traced outputs): on the
    TPU backend an eager forward dispatches every primitive through the
    remote compiler — minutes per calibration batch for a ResNet through
    the relay, vs one ~30 s compile jitted. `percentile` still needs the
    concrete pooled samples and stays eager (CPU-appropriate).
    """
    if method not in ("absmax", "percentile"):
        raise ValueError(f"method must be 'absmax' or 'percentile': {method}")
    from ..models.torch_convert import is_scanned

    if is_scanned(dict(variables).get("params", {})):
        raise ValueError(
            "int8 calibration needs MODEL.EXTRA.USE_SCAN: false — scanned "
            "bodies share one traced conv path, so per-layer scales are "
            "unrecoverable (unstack the params: int8_teacher_from_config / "
            "torch_convert.unstack_from_scan)"
        )
    skip_fn = _make_skip_fn(skip)
    maxima: dict[str, float] = {}
    samples: dict[str, list] = {}
    # None -> the pose-model default (eval mode); pass {} explicitly for
    # models whose __call__ takes no train kwarg
    kw = {"train": False} if apply_kwargs is None else dict(apply_kwargs)

    if method == "absmax":

        def traced_maxima(batch):
            vals: dict[str, jnp.ndarray] = {}

            def interceptor(next_fun, args, kwargs, context):
                mod = context.module
                if (
                    isinstance(mod, nn.Conv)
                    and context.method_name == "__call__"
                    and _supported(mod)
                ):
                    path = _path_of(mod)
                    if not skip_fn(path):
                        m = jnp.max(jnp.abs(args[0].astype(jnp.float32)))
                        vals[path] = (
                            jnp.maximum(vals[path], m) if path in vals else m
                        )
                return next_fun(*args, **kwargs)

            with nn.intercept_methods(interceptor):
                model.apply(variables, batch, **kw)
            return vals

        run = jax.jit(traced_maxima)
        for batch in batches:
            for p, m in jax.device_get(run(batch)).items():
                maxima[p] = max(maxima.get(p, 0.0), float(m))
        ranges = maxima
    else:

        def interceptor(next_fun, args, kwargs, context):
            mod = context.module
            if (
                isinstance(mod, nn.Conv)
                and context.method_name == "__call__"
                and _supported(mod)
            ):
                path = _path_of(mod)
                if not skip_fn(path):
                    ax = np.abs(np.asarray(args[0], np.float32))
                    # subsample to bound memory on big batches (strided:
                    # O(kept), unlike choice(replace=False) whose internal
                    # permutation is O(n) int64)
                    flat = ax.reshape(-1)
                    if flat.size > 1 << 20:
                        flat = flat[:: (flat.size >> 20) or 1]
                    samples.setdefault(path, []).append(flat)
            return next_fun(*args, **kwargs)

        with nn.intercept_methods(interceptor):
            for batch in batches:
                model.apply(variables, batch, **kw)
        ranges = {
            p: float(np.percentile(np.concatenate(v), percentile))
            for p, v in samples.items()
        }
    return {p: max(r, 1e-12) / 127.0 * float(margin)
            for p, r in ranges.items()}


def calibrate_from_loader(
    model: nn.Module,
    variables: Mapping[str, Any],
    loader: Iterable[Mapping[str, Any]],
    n_batches: int,
    use_scan: bool = False,
    **calib_kwargs,
) -> dict[str, float]:
    """Shared CLI calibration path (tools/export.py --int8,
    tools/test_corruption.py TEST.INT8): rejects scanned models up front,
    pulls `n_batches` host batches from `loader` ("image" key, uint8),
    applies the ImageNet normalization the eval preps use, and returns
    the activation scales."""
    from .augment import IMAGENET_MEAN_STD

    if use_scan:
        raise ValueError(
            "int8 needs MODEL.EXTRA.USE_SCAN: false — calibration runs "
            "eagerly and scanned bodies trace (ops/quant.py)"
        )
    mean, std = IMAGENET_MEAN_STD
    calib = []
    for i, b in enumerate(loader):
        if i >= int(n_batches):
            break
        calib.append((jnp.asarray(b["image"], jnp.float32) - mean) / std)
    if not calib:
        raise ValueError("int8 calibration: no batches available")
    return calibrate_act_scales(model, variables, calib, **calib_kwargs)


# ---------------------------------------------------------------------------
# Quantized apply
# ---------------------------------------------------------------------------

def make_quantized_apply(
    model: nn.Module,
    act_scales: Mapping[str, float],
    skip=None,
    fallback_scale: float | None = None,
    w_scales: Mapping[str, Any] | None = None,
) -> Callable:
    """Drop-in `model.apply` replacement running int8 convs.

    Convs whose path has no calibrated scale use `fallback_scale` if
    given, else stay unquantized. Works under jit / jax.export (the
    interceptor rewrites the graph at trace time). With `w_scales`
    (from `prequantize_params`), kernels in the variables tree are
    already int8 and the per-channel scales are baked-in constants.

    After the first trace, `apply_fn.quantized_paths` holds the conv paths
    actually intercepted; scales whose path never matched any conv (e.g.
    calibrated on a differently-named scanned/unscanned construction)
    trigger a loud warning instead of silently serving f32 (ADVICE r3 #2).
    """
    skip_fn = _make_skip_fn(skip)
    quantized_paths: set = set()
    state = {"checked": False}

    def interceptor(next_fun, args, kwargs, context):
        mod = context.module
        if (
            isinstance(mod, nn.Conv)
            and context.method_name == "__call__"
            and _supported(mod)
        ):
            path = _path_of(mod)
            if not skip_fn(path):
                scale = act_scales.get(path, fallback_scale)
                if scale is not None:
                    quantized_paths.add(path)
                    ws = w_scales.get(path) if w_scales else None
                    return _quantized_conv(mod, args[0], float(scale), ws)
        return next_fun(*args, **kwargs)

    def apply_fn(variables, *args, **kwargs):
        with nn.intercept_methods(interceptor):
            out = model.apply(variables, *args, **kwargs)
        if not state["checked"]:
            state["checked"] = True
            unmatched = sorted(set(act_scales) - quantized_paths)
            if not quantized_paths:
                warnings.warn(
                    "int8 apply quantized ZERO convs — none of the "
                    f"{len(act_scales)} calibrated paths matched a conv in "
                    "this model (scanned vs unscanned construction, or a "
                    "renamed module?); the 'int8' forward is running f32"
                )
            elif unmatched:
                warnings.warn(
                    f"int8 apply: {len(unmatched)} calibrated path(s) never "
                    f"matched any conv (first: {unmatched[:3]}); those convs "
                    "are running f32"
                )
        return out

    apply_fn.quantized_paths = quantized_paths
    return apply_fn


def quantized_model_view(model: nn.Module, act_scales, skip=None,
                         fallback_scale=None, w_scales=None):
    """An object exposing `.apply` like a flax module, for call sites
    (eval steps, export) that take a model and only use `.apply`."""

    class _View:
        def __init__(self):
            self.apply = make_quantized_apply(
                model, act_scales, skip=skip, fallback_scale=fallback_scale,
                w_scales=w_scales,
            )

        def __getattr__(self, name):
            return getattr(model, name)

    return _View()


def make_int8_teacher_apply(
    model_unscanned: nn.Module,
    act_scales: Mapping[str, float],
    skip=None,
):
    """Int8 TEACHER forward for the fused AdvMix step (a training-perf
    lever with NO reference counterpart — the reference's teacher runs
    fp32, `lib/core/function.py:148-149`).

    The teacher is frozen inference inside an otherwise HBM-bound train
    step, so its forward can run W8A8 exactly like the serving path
    (~2x MXU rate, ~half the weight/activation bytes). Returns
    `teacher_apply(variables, images) -> output` for
    `engine.steps.make_advmix_step(..., teacher_apply=...)`:

    - `variables` may be the SCANNED (USE_SCAN) teacher tree straight
      from the train state; it is unstacked to the per-conv-path layout
      inside the trace (tracer-safe slicing, `torch_convert.
      unstack_from_scan`) so the conv interceptor sees distinct paths.
    - the quantized forward runs eval-mode on the unscanned
      construction (same weights; unscan/scan forward parity is tested
      in test_hrnet_convert.py).

    The KD target moves from f32 to int8-rounded teacher heatmaps —
    opt-in (TRAIN.INT8_TEACHER) and measured, not default.
    """
    from ..models.torch_convert import is_scanned, unstack_from_scan

    q_apply = make_quantized_apply(model_unscanned, act_scales, skip=skip)

    def teacher_apply(variables, images):
        variables = {
            k: (unstack_from_scan(v)
                if isinstance(v, dict) and is_scanned(v) else v)
            for k, v in dict(variables).items()
        }
        return q_apply(variables, images, train=False)

    return teacher_apply


def int8_teacher_from_config(
    cfg,
    dtype,
    teacher_variables: Mapping[str, Any],
    *,
    loader=None,
    n_batches: int = 2,
    margin: float = 1.0,
    calib_images=None,
):
    """One-stop TRAIN.INT8_TEACHER constructor (shared by tools/train.py
    and bench.py so the clone-unscan-calibrate recipe exists once):
    clones `cfg` with USE_SCAN off, builds the unscanned model at
    `dtype`, unstacks scanned teacher variables eagerly for calibration,
    calibrates activation scales — from `loader` ("image" uint8 batches,
    ImageNet-normalized, `calibrate_from_loader` semantics incl.
    `margin`) or from `calib_images` (already-normalized float arrays) —
    and returns `(teacher_apply, act_scales)`.
    """
    import numpy as _np

    from .. import models as _models
    from ..models.torch_convert import is_scanned, unstack_from_scan

    cfg_uns = cfg.clone()
    cfg_uns.defrost()
    extra_uns = dict(cfg_uns.MODEL.EXTRA)
    extra_uns["USE_SCAN"] = False
    cfg_uns.MODEL.EXTRA = extra_uns
    cfg_uns.freeze()
    model_uns = _models.get_pose_net(cfg_uns, dtype=dtype)
    vars_uns = {
        k: (unstack_from_scan(v)
            if isinstance(v, dict) and is_scanned(v) else v)
        for k, v in {
            k2: jax.tree.map(_np.asarray, v2)
            for k2, v2 in dict(teacher_variables).items()
        }.items()
    }
    if loader is not None:
        act_scales = calibrate_from_loader(
            model_uns, vars_uns, loader, n_batches, margin=margin
        )
    else:
        if not calib_images:
            raise ValueError("int8 teacher: pass loader= or calib_images=")
        act_scales = calibrate_act_scales(
            model_uns, vars_uns, list(calib_images), margin=margin
        )
    return make_int8_teacher_apply(model_uns, act_scales), act_scales


def prequantize_params(
    params: Mapping[str, Any],
    act_scales: Mapping[str, float],
    skip=None,
) -> tuple[dict, dict[str, np.ndarray]]:
    """Quantize conv kernels IN the params tree to int8 (4x smaller
    serving weights; no per-call weight quantization work).

    Quantizes exactly the convs `make_quantized_apply` would quantize:
    every path with a calibrated activation scale that isn't skipped.
    Returns (new_params, {path: per-channel weight scale}); pass both to
    `make_quantized_apply(..., w_scales=...)` — the scales become
    baked-in constants of the traced/exported module.

    NOTE an int8 tree no longer loads into the regular f32 model; keep
    it as a serving artifact next to the exported StableHLO module.
    """
    skip_fn = _make_skip_fn(skip)
    # rebuild as plain dicts first: leaf dicts are mutated below, and flax
    # FrozenDict nodes (older checkpoints / callers passing frozen
    # variables, at any nesting level) would raise a bare TypeError deep
    # in the loop (ADVICE r3 #4)
    from flax.core import FrozenDict

    def _plain(d):
        if isinstance(d, (dict, FrozenDict)):
            return {k: _plain(v) for k, v in d.items()}
        return d

    new_params = _plain(params)
    w_scales: dict[str, np.ndarray] = {}
    for path in act_scales:
        if skip_fn(path):
            continue
        node = new_params
        keys = path.split("/")
        for k in keys[:-1]:
            node = node[k]
        leaf = node[keys[-1]]
        if "kernel" not in leaf:
            continue
        wq, scale = quantize_weight(leaf["kernel"])
        leaf["kernel"] = wq
        w_scales[path] = np.asarray(scale)
    return new_params, w_scales
