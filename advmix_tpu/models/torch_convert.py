"""torch checkpoint -> flax variables converter.

Needed to reproduce the reference's fine-tune recipe: AdvMix loads ImageNet
trunks and pretrained pose checkpoints (`tools/train.py:198-235`, with
'module.' DataParallel prefix rewriting and shape-filtered partial loads).

Every leaf flax module in this package carries a globally unique name that is
the torch module path with '.' replaced by '_' (e.g. torch
`stage2.0.branches.0.0.conv1` -> flax leaf module `stage2_0_branches_0_0_conv1`),
so conversion is a pure key mapping plus layout transposes:

- Conv weight:  torch OIHW -> flax HWIO
- ConvTranspose weight: torch (in, out, kh, kw) -> flax transpose_kernel
  layout (kh, kw, out, in)
- BatchNorm: weight->scale, bias->bias (params); running_mean->mean,
  running_var->var (batch_stats)
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np


def strip_module_prefix(state_dict: Dict[str, Any]) -> Dict[str, Any]:
    """Remove DataParallel 'module.' prefixes (`tools/train.py:201`)."""
    return {
        (k[len("module."):] if k.startswith("module.") else k): v
        for k, v in state_dict.items()
    }


def _flatten(tree: dict, prefix=()) -> Dict[Tuple[str, ...], Any]:
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flatten(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = v
    return out


def _unflatten(flat: Dict[Tuple[str, ...], Any]) -> dict:
    tree: dict = {}
    for path, v in flat.items():
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = v
    return tree


def _layer_allowed(tkey: str, pretrained_layers) -> bool:
    """PRETRAINED_LAYERS selective-init semantics
    (`lib/models/pose_hrnet.py:483-489`): a torch key loads iff its first
    dotted component is listed, or the list starts with '*'."""
    if pretrained_layers is None:
        return True
    layers = list(pretrained_layers)
    if layers and layers[0] == "*":
        return True
    return tkey.split(".")[0] in layers


def remap_official_higher_hrnet_keys(
    state_dict: Dict[str, Any]
) -> Dict[str, Any]:
    """Rewrite the public HigherHRNet checkpoint layout onto our bottom-up
    naming (models/higher_hrnet.py).

    The official `_make_deconv_layers` nests
    Sequential(Sequential(ConvT, BN, ReLU), Sequential(BasicBlock), ...)
    per deconv stage, producing keys
        deconv_layers.<i>.0.0.*           (ConvTranspose)
        deconv_layers.<i>.0.1.*           (BatchNorm)
        deconv_layers.<i>.<j>.0.conv1.*   (BasicBlock j-1), j >= 1
    which we map to deconv_layers_<i>_deconv / _bn / _block_<j-1>_... .
    Keys not matching the 3-numeric-index pattern pass through untouched
    (PoseResNet's flat `deconv_layers.<k>.*` Sequential has one index, so
    top-down checkpoints are unaffected). `final_layers.<i>.*` already maps
    by the generic dots->underscores rule."""
    import re

    pat = re.compile(r"^deconv_layers\.(\d+)\.(\d+)\.0\.(.+)$")
    out = {}
    for k, v in state_dict.items():
        m = pat.match(k)
        if m is None:
            out[k] = v
            continue
        i, j, rest = int(m.group(1)), int(m.group(2)), m.group(3)
        if j == 0:
            # Sequential(ConvT@0, BN@1, ReLU@2): inner index 0 == ConvT
            out[f"deconv_layers_{i}_deconv.{rest}"] = v
        else:
            out[f"deconv_layers_{i}_block_{j - 1}.{rest}"] = v
    # BN keys (inner index 1) did not match the first pattern
    pat_bn = re.compile(r"^deconv_layers\.(\d+)\.0\.1\.(.+)$")
    rest_keys = {}
    for k, v in out.items():
        m = pat_bn.match(k)
        if m is None:
            rest_keys[k] = v
        else:
            rest_keys[f"deconv_layers_{m.group(1)}_bn.{m.group(2)}"] = v
    return rest_keys


def torch_to_flax_variables(
    state_dict: Dict[str, Any],
    variables: dict,
    strict: bool = False,
    filter_shapes: bool = True,
    pretrained_layers=None,
    return_report: bool = False,
) -> dict:
    """Fill a flax variables dict {'params':..., 'batch_stats':...} from a
    torch state_dict. Unknown/shape-mismatched torch entries are skipped
    when `filter_shapes` (matching the reference's shape-filtered partial
    load, `tools/train.py:225-231`). `pretrained_layers` applies the
    reference's selective init filter (`lib/models/pose_hrnet.py:462-492`).
    With `return_report`, also returns {'matched': n, 'misses': [...],
    'filtered': [...]} so callers can verify the load actually happened."""
    state_dict = strip_module_prefix(state_dict)
    state_dict = remap_official_higher_hrnet_keys(state_dict)
    filtered = [k for k in state_dict
                if not _layer_allowed(k, pretrained_layers)]
    if filtered:
        state_dict = {k: v for k, v in state_dict.items()
                      if _layer_allowed(k, pretrained_layers)}
    flat_params = _flatten(variables.get("params", {}))
    flat_stats = _flatten(variables.get("batch_stats", {}))

    # Index flax leaves by their unique leaf-module name.
    by_leaf: Dict[str, Dict[str, Tuple[Tuple[str, ...], Any]]] = {}
    for path, v in flat_params.items():
        by_leaf.setdefault(path[-2], {})[("params", path[-1])] = (path, v)
    for path, v in flat_stats.items():
        by_leaf.setdefault(path[-2], {})[("stats", path[-1])] = (path, v)

    new_params = dict(flat_params)
    new_stats = dict(flat_stats)
    misses = []
    matched = 0

    for tkey, tval in state_dict.items():
        if tkey.endswith("num_batches_tracked"):
            continue
        mod_path, _, leaf = tkey.rpartition(".")
        flax_mod = mod_path.replace(".", "_")
        entry = by_leaf.get(flax_mod)
        if entry is None:
            misses.append(tkey)
            continue
        arr = np.asarray(tval.detach().cpu().numpy() if hasattr(tval, "detach") else tval)

        if leaf == "weight" and ("params", "kernel") in entry:
            path, cur = entry[("params", "kernel")]
            if arr.ndim == 4:
                # One permutation covers both layer kinds:
                #   torch Conv  (O,I,kh,kw) -> flax HWIO (kh,kw,I,O)
                #   torch ConvT (I,O,kh,kw) -> flax transpose_kernel layout
                #                              (kh,kw,O,I)
                arr = np.transpose(arr, (2, 3, 1, 0))
            dest = ("params", path, arr)
        elif leaf == "weight" and ("params", "scale") in entry:
            path, cur = entry[("params", "scale")]
            dest = ("params", path, arr)
        elif leaf == "bias" and ("params", "bias") in entry:
            path, cur = entry[("params", "bias")]
            dest = ("params", path, arr)
        elif leaf == "running_mean" and ("stats", "mean") in entry:
            path, cur = entry[("stats", "mean")]
            dest = ("stats", path, arr)
        elif leaf == "running_var" and ("stats", "var") in entry:
            path, cur = entry[("stats", "var")]
            dest = ("stats", path, arr)
        else:
            misses.append(tkey)
            continue

        kind, path, arr = dest
        cur = (flat_params if kind == "params" else flat_stats)[path]
        if arr.shape != cur.shape:
            if filter_shapes:
                misses.append(tkey)
                continue
            raise ValueError(f"{tkey}: shape {arr.shape} != {cur.shape}")
        if kind == "params":
            new_params[path] = arr.astype(np.asarray(cur).dtype)
        else:
            new_stats[path] = arr.astype(np.asarray(cur).dtype)
        matched += 1

    if strict and misses:
        raise KeyError(f"unmatched torch keys: {misses}")

    out = dict(variables)
    out["params"] = _unflatten(new_params)
    if flat_stats:
        out["batch_stats"] = _unflatten(new_stats)
    if return_report:
        return out, {"matched": matched, "misses": misses,
                     "filtered": filtered}
    return out


# ---------------------------------------------------------------------------
# scan <-> unscanned param restacking (PoseHighResolutionNet USE_SCAN)
# ---------------------------------------------------------------------------

def _resolve_scan_path(path, stage_m=None, block_b=None):
    """Map a scanned variable path to the unscanned path for given
    (stage module, block) indices."""
    out = []
    i = 0
    stage_prefix = None
    branch_prefix = None
    while i < len(path):
        p = path[i]
        # classify a *_scan container by its child: "mod" = a scanned
        # HighResolutionModule stage, "block" = scanned residual blocks
        # (HRNet branches AND ResNet layer tails, e.g. layer3_scan)
        if (p.endswith("_scan") and i + 1 < len(path)
                and path[i + 1] == "mod"):
            stage_prefix = p[: -len("_scan")] + f"_{stage_m}"
            out.append(stage_prefix)
            i += 2
            continue
        if (p.endswith("_scan") and i + 1 < len(path)
                and path[i + 1] == "block"):
            base = p[: -len("_scan")]
            base = base.replace("mod", stage_prefix, 1) if base.startswith("mod") else base
            # ResNet tails start at block index 1 (block 0 downsamples
            # and stays unscanned); HRNet branch scans start at 0
            start = 1 if not ("_branches_" in p or p.startswith("mod")) else 0
            branch_prefix = base + f"_{block_b + start}"
            out.append(branch_prefix)
            i += 2
            continue
        if p.startswith("mod_") and stage_prefix is not None:
            out.append(p.replace("mod", stage_prefix, 1))
            i += 1
            continue
        if p.startswith("block_") and branch_prefix is not None:
            out.append(p.replace("block", branch_prefix, 1))
            i += 1
            continue
        out.append(p)
        i += 1
    return tuple(out)


def _scan_kinds(path):
    has_stage = any(
        p.endswith("_scan") and i + 1 < len(path) and path[i + 1] == "mod"
        for i, p in enumerate(path)
    )
    has_block = any(
        p.endswith("_scan") and i + 1 < len(path) and path[i + 1] == "block"
        for i, p in enumerate(path)
    )
    return has_stage, has_block


def is_scanned(tree: dict) -> bool:
    """True if a variables collection uses the scanned (USE_SCAN) layout."""
    return any(any(_scan_kinds(path)) for path in _flatten(tree))


def unstack_from_scan(scanned: dict) -> dict:
    """Inverse of `stack_for_scan`: expand a scanned variable collection
    into the unscanned (torch-key-mirroring) layout by slicing the leading
    module/block axes. Lets torch checkpoints load into USE_SCAN models:
    unstack -> key-map -> restack (the reference's fine-tune load,
    `tools/train.py:198-235`, has no scan concept to match)."""
    import numpy as _np

    out = {}
    for path, val in _flatten(scanned).items():
        has_stage, has_block = _scan_kinds(path)
        if not has_stage and not has_block:
            out[path] = val
            continue
        if not hasattr(val, "shape"):
            val = _np.asarray(val)
        # (jax tracers pass through untouched: slicing below is jit-safe,
        # so a scanned teacher can be unstacked INSIDE a compiled step —
        # the int8-teacher path in engine/steps.make_advmix_step)
        if has_stage and has_block:
            for m in range(val.shape[0]):
                for b in range(val.shape[1]):
                    out[_resolve_scan_path(path, m, b)] = val[m, b]
        elif has_block:
            for b in range(val.shape[0]):
                out[_resolve_scan_path(path, None, b)] = val[b]
        else:
            for m in range(val.shape[0]):
                out[_resolve_scan_path(path, m, None)] = val[m]
    return _unflatten(out)


def stack_for_scan(unscanned: dict, scanned_template: dict) -> dict:
    """Restack an unscanned HRNet variable collection (params or
    batch_stats) into the scanned layout.

    The scanned model (pose_hrnet.py USE_SCAN) stores stage modules under
    `stage<si>_scan/mod/...` with a leading module axis, and branch blocks
    under `<prefix>_branches_<i>_scan/block/...` with a leading block axis.
    This walks the scanned template and gathers the per-index leaves from
    the unscanned tree, so torch checkpoints (imported via the unscanned
    layout) can run in the scanned model.
    """
    import numpy as _np

    flat_un = _flatten(unscanned)
    resolve = _resolve_scan_path

    new_flat = {}
    for path, tmpl in _flatten(scanned_template).items():
        has_stage_scan, has_block_scan = _scan_kinds(path)
        if not has_stage_scan and not has_block_scan:
            new_flat[path] = flat_un[path]
            continue
        tmpl_shape = _np.asarray(tmpl).shape
        if has_stage_scan and has_block_scan:
            n_m, n_b = tmpl_shape[0], tmpl_shape[1]
            stacked = _np.stack([
                _np.stack([
                    _np.asarray(flat_un[resolve(path, m, b)]) for b in range(n_b)
                ]) for m in range(n_m)
            ])
        elif has_block_scan:
            n_b = tmpl_shape[0]
            stacked = _np.stack([
                _np.asarray(flat_un[resolve(path, None, b)]) for b in range(n_b)
            ])
        else:
            n_m = tmpl_shape[0]
            stacked = _np.stack([
                _np.asarray(flat_un[resolve(path, m, None)]) for m in range(n_m)
            ])
        assert stacked.shape == tmpl_shape, (path, stacked.shape, tmpl_shape)
        new_flat[path] = stacked
    return _unflatten(new_flat)


# ---------------------------------------------------------------------------
# UNet generator (recursive torch naming -> flattened encoder/decoder)
# ---------------------------------------------------------------------------

def torch_unet_key(depth: int, kind: str, num_downs: int = 6) -> str:
    """Key prefix of the reference UnetGenerator's conv at `depth`
    (0 = outermost). The recursive construction
    (`lib/models/Unet_generator.py:85-109`) yields:
      depth 0: down = model.model.0, up = model.model.3
      depth d: prefix model.model.1.(model.3.)^(d-1) + model.1 (down) /
               model.5 (up; model.3 at the innermost block)."""
    if depth == 0:
        return "model.model.0" if kind == "down" else "model.model.3"
    prefix = "model.model.1." + "model.3." * (depth - 1)
    if kind == "down":
        return prefix + "model.1"
    return prefix + ("model.3" if depth == num_downs - 1 else "model.5")


def torch_unet_to_flax(state_dict, variables: dict,
                       num_downs: int = 6) -> dict:
    """Convert a reference UnetGenerator checkpoint into our flattened
    UnetGenerator variables (models/unet.py down_i_conv / up_i_conv).
    InstanceNorm carries no parameters (affine=False), so the 12 convs
    (weight+bias) are the whole state."""
    state_dict = strip_module_prefix(state_dict)
    flat = _flatten(variables["params"])
    new = dict(flat)
    for d in range(num_downs):
        for kind, mod in (("down", f"down_{d}_conv"),
                          ("up", f"up_{d}_conv")):
            base = torch_unet_key(d, kind, num_downs)
            w = state_dict[base + ".weight"]
            b = state_dict[base + ".bias"]
            w = np.asarray(w.detach().cpu().numpy()
                           if hasattr(w, "detach") else w)
            b = np.asarray(b.detach().cpu().numpy()
                           if hasattr(b, "detach") else b)
            # Conv OIHW and ConvTranspose IOHW both land on our layouts
            # with one permutation (see torch_to_flax_variables)
            w = np.transpose(w, (2, 3, 1, 0))
            kpath, bpath = (mod, "kernel"), (mod, "bias")
            if kpath not in flat:
                raise KeyError(f"flax UNet missing {kpath}")
            if w.shape != np.asarray(flat[kpath]).shape:
                raise ValueError(
                    f"{base}.weight {w.shape} != {np.asarray(flat[kpath]).shape}"
                )
            new[kpath] = w.astype(np.asarray(flat[kpath]).dtype)
            new[bpath] = b.astype(np.asarray(flat[bpath]).dtype)
    out = dict(variables)
    out["params"] = _unflatten(new)
    return out
