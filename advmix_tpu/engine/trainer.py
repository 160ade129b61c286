"""Host-side training/validation drivers.

The TPU-native counterpart of `tools/train.py:283-328` +
`lib/core/function.py`: the epoch loop, per-epoch LR schedule writes,
AUTO_RESUME, best-model tracking and final export live here on the host;
each iteration is exactly one compiled device program (engine/steps.py),
fed by the threaded Loader with on-device preprocessing (normalize /
3-view synthesis / Gaussian targets).
"""

from __future__ import annotations

import logging
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

from ..data import Loader
from ..ops.augment import make_advmix_views, IMAGENET_MEAN_STD
from ..ops.heatmap import generate_target
from ..ops.corruptions import corrupt, BENCHMARK_CORRUPTIONS
from ..parallel import device_put_batch
from ..utils.logging import AverageMeter, print_name_value

logger = logging.getLogger("advmix_tpu")


def make_random_corruption_fn(mesh, chunk: int = 1, axis: str = "data"):
    """Per-IMAGE random (type, severity) corruption for the
    `--random_corruption` baseline (`JointsDataset.py:284-286` draws per
    image in __getitem__).

    TPU-native design: under shard_map each replica reshapes its local
    batch to (n_chunks, chunk, H, W, C) and lax.scan's a single 75-branch
    lax.switch body over the chunks — one compiled corruption subprogram
    per (type, severity), per-image draws at chunk=1, and no cross-device
    traffic. chunk > 1 trades draw granularity for larger (faster) ops.

    Samples ONLY the 15 benchmark corruptions: the reference's baseline
    hardcodes that list in `get_clean` (`JointsDataset.py:259-264`) — the
    4 holdout types are excluded so the held-out mPC protocol stays
    uncontaminated."""
    from jax.sharding import PartitionSpec as P

    from ..parallel.mesh import data_axes

    axis = data_axes(mesh, axis)
    n_types = len(BENCHMARK_CORRUPTIONS)
    branches = []
    for i in range(n_types * 5):
        name = BENCHMARK_CORRUPTIONS[i // 5]
        sev = i % 5 + 1
        branches.append(
            lambda x, k, name=name, sev=sev: corrupt(x, name, sev, k)
        )

    def local(img, key):
        b, h, w, c = img.shape
        ch = min(chunk, b)
        n_chunks = b // ch
        rem = img[n_chunks * ch:]
        for ax in (axis if isinstance(axis, tuple) else (axis,)):
            key = jax.random.fold_in(key, jax.lax.axis_index(ax))
        keys = jax.random.split(key, n_chunks)

        def body(_, xs):
            x, kk = xs
            k_c, k_s = jax.random.split(kk)
            idx = jax.random.randint(k_c, (), 0, n_types * 5)
            return None, jax.lax.switch(idx, branches, x, k_s)

        _, out = jax.lax.scan(
            body, None, (img[: n_chunks * ch].reshape(n_chunks, ch, h, w, c),
                         keys)
        )
        out = out.reshape(n_chunks * ch, h, w, c)
        if rem.shape[0]:
            k_c, k_s = jax.random.split(jax.random.fold_in(key, -1))
            idx = jax.random.randint(k_c, (), 0, n_types * 5)
            out = jnp.concatenate(
                [out, jax.lax.switch(idx, branches, rem, k_s)]
            )
        return out

    return jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(axis), P()), out_specs=P(axis), check_vma=False,
    )


def make_preprocessor(cfg, advmix: bool, train: bool,
                      random_corruption: bool = False, mesh=None,
                      corruption_chunk: int = 1, sp_style: bool = False,
                      device_warp: bool = False):
    """Jitted device-side batch prep: crops (or, with device_warp, padded
    raw images + crop matrices, ops/transforms.warp_affine) -> normalized
    views + Gaussian targets. Signature: prep(raw_dict, key); the keys it
    needs from the host batch are listed in `prep.required`.

    sp_style: views take the per-sample `is_style` mask (advaug.py:182,192
    exemptions)."""
    image_size = tuple(cfg.MODEL.IMAGE_SIZE)
    heatmap_size = tuple(cfg.MODEL.HEATMAP_SIZE)
    sigma = float(cfg.MODEL.SIGMA)
    mean, std = IMAGENET_MEAN_STD
    # synthesize the views at the training compute dtype: the AdvMix step
    # is HBM-bound and bf16 halves the augment bytes (<= 1 uint8 LSB drift)
    view_dtype = (jnp.bfloat16
                  if str(cfg.TRAIN.DTYPE) == "bfloat16" else None)

    corrupt_fn = None
    if random_corruption and train:
        if mesh is None:
            from ..parallel import get_mesh

            mesh = get_mesh()
        corrupt_fn = make_random_corruption_fn(mesh, chunk=corruption_chunk)

    @jax.jit
    def prep_jit(raw, key):
        img = raw["image"].astype(jnp.float32)
        if device_warp:
            from ..ops.transforms import warp_affine

            img = warp_affine(img, raw["warp_matrix"], image_size)
        if corrupt_fn is not None:
            k_c, key = jax.random.split(key)
            img = corrupt_fn(img, k_c)
        target, _, tw = generate_target(
            raw["joints"], raw["joints_vis"], image_size, heatmap_size, sigma
        )
        if advmix:
            views = make_advmix_views(
                img, key, style_mask=raw.get("is_style"),
                out_dtype=view_dtype, compute_dtype=view_dtype,
            )
            return {"views": views, "target": target, "target_weight": tw}
        norm = (img - mean) / std
        return {"image": norm, "target": target, "target_weight": tw}

    def prep(raw, key):
        return prep_jit(raw, key)

    prep.required = tuple(
        ["image", "joints", "joints_vis"]
        + (["warp_matrix"] if device_warp else [])
        + (["is_style"] if sp_style else [])
    )
    return prep


def make_eval_preprocessor(cfg):
    image_size = tuple(cfg.MODEL.IMAGE_SIZE)
    heatmap_size = tuple(cfg.MODEL.HEATMAP_SIZE)
    sigma = float(cfg.MODEL.SIGMA)
    mean, std = IMAGENET_MEAN_STD

    @jax.jit
    def prep(image_u8, joints, joints_vis):
        img = image_u8.astype(jnp.float32)
        target, _, tw = generate_target(
            joints, joints_vis, image_size, heatmap_size, sigma
        )
        return {"image": (img - mean) / std, "target": target,
                "target_weight": tw}

    return prep


def train_epoch(
    cfg,
    step_fn,
    prep_fn,
    state,
    loader: Loader,
    mesh,
    epoch: int,
    key,
    writer=None,
    writer_state=None,
    advmix: bool = False,
):
    """One epoch of compiled steps (reference `train`/`train_advmix`)."""
    batch_time = AverageMeter()
    data_time = AverageMeter()
    losses = AverageMeter()
    accs = AverageMeter()

    end = time.time()
    for i, host_batch in enumerate(loader):
        data_time.update(time.time() - end)
        key, sub = jax.random.split(key)
        required = getattr(prep_fn, "required",
                           ("image", "joints", "joints_vis"))
        host = {}
        for k in required:
            if k in host_batch:
                host[k] = host_batch[k]
            elif k == "is_style":
                if not getattr(train_epoch, "_warned_is_style", False):
                    train_epoch._warned_is_style = True
                    logger.warning(
                        "batch lacks 'is_style'; zero-filling — the "
                        "--sp_style AutoAugment/GridMask exemption is "
                        "inactive for these samples"
                    )
                host[k] = np.zeros(len(host_batch["image"]), np.float32)
            else:
                raise KeyError(
                    f"loader batch lacks '{k}' required by the preprocessor "
                    f"(device_warp needs Loader(raw_mode=True))"
                )
        raw = device_put_batch(host, mesh)
        batch = prep_fn(raw, sub)
        result = step_fn(state, batch)
        debug_out = None
        if len(result) == 3:
            state, metrics, debug_out = result
        else:
            state, metrics = result

        loss_key = "loss_d" if advmix else "loss"
        n = host_batch["_n"]
        losses.update(float(metrics[loss_key]), n)
        accs.update(float(metrics["acc"]), int(metrics["acc_cnt"]))
        batch_time.update(time.time() - end)
        end = time.time()

        if i % cfg.PRINT_FREQ == 0:
            if debug_out is not None and cfg.DEBUG.DEBUG:
                _dump_debug_images(
                    cfg, host_batch, batch, debug_out, output_dir_of(cfg),
                    epoch, i, advmix,
                )
            msg = (
                f"Epoch: [{epoch}][{i}/{len(loader)}]\t"
                f"Time {batch_time.val:.3f}s ({batch_time.avg:.3f}s)\t"
                f"Speed {n / max(batch_time.val, 1e-9):.1f} samples/s\t"
                f"Data {data_time.val:.3f}s ({data_time.avg:.3f}s)\t"
                f"Loss {losses.val:.5f} ({losses.avg:.5f})\t"
                f"Accuracy {accs.val:.3f} ({accs.avg:.3f})"
            )
            logger.info(msg)
            if writer is not None and writer_state is not None:
                gs = writer_state.get("train_global_steps", 0)
                writer.add_scalar("train_loss", losses.val, gs)
                writer.add_scalar("train_acc", accs.val, gs)
                writer_state["train_global_steps"] = gs + 1
    return state, key


def merge_prediction_shards(parts):
    """Merge per-process eval outputs into one prediction set.

    parts: list over processes of (indices (n_p,), preds (n_p, J, 3),
    boxes (n_p, 6)). Returns (indices, preds, boxes) concatenated and
    stably ordered by global dataset index — the exact set an unsharded
    pass would produce (shards are disjoint by construction)."""
    idx = np.concatenate([np.asarray(p[0], np.int64) for p in parts])
    preds = np.concatenate([np.asarray(p[1]) for p in parts])
    boxes = np.concatenate([np.asarray(p[2]) for p in parts])
    order = np.argsort(idx, kind="stable")
    return idx[order], preds[order], boxes[order]


def _local_eval_rows(x):
    """This process's rows of a batch-sharded eval output (multi-host:
    device_get of non-addressable shards is illegal)."""
    shards = sorted(
        x.addressable_shards,
        key=lambda s: (s.index[0].start or 0),
    )
    return np.concatenate([np.asarray(s.data) for s in shards])


def validate(
    cfg,
    eval_step,
    prep_fn,
    params,
    batch_stats,
    dataset,
    loader: Loader,
    mesh,
    output_dir: str,
    writer=None,
    writer_state=None,
    debug_out_dir: str | None = None,
):
    """Full validation pass + dataset.evaluate
    (reference `validate`, lib/core/function.py:200-360).

    `debug_out_dir` (with an eval_step built debug=True) dumps val
    joint-overlay/heatmap grids every PRINT_FREQ, gated by DEBUG.* —
    the reference's validate-time save_debug_images
    (lib/core/function.py:301-316).

    Multi-host: the caller shards `loader` per process; each process
    accumulates only its own prediction rows, the shards are allgathered
    and merged by dataset index, and COCOeval/PCKh runs on process 0 only
    (perf broadcast back), so an N-host corruption sweep does 1/N of the
    eval passes per host instead of all of them."""
    losses = AverageMeter()
    accs = AverageMeter()
    pck_hit_tot = np.zeros(dataset.num_joints, np.float64)
    pck_val_tot = np.zeros(dataset.num_joints, np.float64)
    n_proc = jax.process_count()
    num_samples = len(dataset)
    all_preds = np.zeros((num_samples, dataset.num_joints, 3), np.float32)
    all_boxes = np.zeros((num_samples, 6))
    all_indices = np.zeros(num_samples, np.int64)
    image_paths = []
    idx = 0
    t_device = 0.0

    for bi, host_batch in enumerate(loader):
        bsz = len(host_batch["image"])
        raw = device_put_batch(
            {
                "image": host_batch["image"],
                "joints": host_batch["joints"],
                "joints_vis": host_batch["joints_vis"],
                "center": host_batch["center"].astype(np.float32),
                "scale": host_batch["scale"].astype(np.float32),
                # mask for the Loader's padded tail rows so logged
                # loss/PCK are invariant to TEST.BATCH_SIZE_PER_GPU
                "valid": (np.arange(bsz) < host_batch["_n"]).astype(
                    np.float32
                ),
            },
            mesh,
        )
        prepped = prep_fn(raw["image"], raw["joints"], raw["joints_vis"])
        batch = dict(prepped)
        batch["center"] = raw["center"]
        batch["scale"] = raw["scale"]
        batch["valid"] = raw["valid"]
        t0 = time.time()
        step_out = eval_step(params, batch_stats, batch)
        preds, maxvals, metrics = step_out[:3]
        if debug_out_dir is not None and len(step_out) == 4 \
                and bi % cfg.PRINT_FREQ == 0:
            _dump_val_debug_images(
                cfg, host_batch, batch, step_out[3], debug_out_dir, bi
            )
        if n_proc > 1:
            preds = _local_eval_rows(preds)
            maxvals = _local_eval_rows(maxvals)
        else:
            preds, maxvals = jax.device_get((preds, maxvals))
        t_device += time.time() - t0

        n = host_batch["_n"]
        losses.update(float(metrics["loss"]), n)
        accs.update(float(metrics["acc"]), int(metrics["acc_cnt"]))
        pck_hit_tot = pck_hit_tot + np.asarray(metrics["pck_hit_j"])
        pck_val_tot = pck_val_tot + np.asarray(metrics["pck_valid_j"])

        c = host_batch["center"][:n]
        s = host_batch["scale"][:n]
        score = host_batch["score"][:n]
        all_preds[idx : idx + n, :, 0:2] = preds[:n]
        all_preds[idx : idx + n, :, 2:3] = maxvals[:n]
        all_boxes[idx : idx + n, 0:2] = c
        all_boxes[idx : idx + n, 2:4] = s
        all_boxes[idx : idx + n, 4] = np.prod(s * 200, 1)
        all_boxes[idx : idx + n, 5] = score
        all_indices[idx : idx + n] = host_batch.get(
            "_indices", np.arange(idx, idx + len(host_batch["image"]))
        )[:n]
        image_paths.extend(host_batch["image_path"][:n])
        idx += n

    logger.info(
        "=> The average device time per batch: %.4fs", t_device / max(len(loader), 1)
    )
    if n_proc > 1:
        from jax.experimental import multihost_utils

        # pad local arrays to a common length, allgather, trim by counts
        counts = np.asarray(
            multihost_utils.process_allgather(np.int64(idx))
        ).reshape(-1)
        m = int(counts.max())

        def _pad_to(a, m):
            pad = np.zeros((m - len(a),) + a.shape[1:], a.dtype)
            return np.concatenate([a, pad]) if m > len(a) else a

        g_idx = np.asarray(multihost_utils.process_allgather(
            _pad_to(all_indices[:idx], m)))
        g_preds = np.asarray(multihost_utils.process_allgather(
            _pad_to(all_preds[:idx], m)))
        g_boxes = np.asarray(multihost_utils.process_allgather(
            _pad_to(all_boxes[:idx], m)))
        parts = [
            (g_idx[p][: counts[p]], g_preds[p][: counts[p]],
             g_boxes[p][: counts[p]])
            for p in range(len(counts))
        ]
        merged_idx, merged_preds, merged_boxes = merge_prediction_shards(
            parts
        )
        if jax.process_index() == 0:
            paths = [dataset.records[int(i)]["image"] for i in merged_idx]
            name_values, perf = dataset.evaluate(
                cfg, merged_preds, output_dir, merged_boxes, paths,
                indices=merged_idx,
            )
        else:
            name_values, perf = {}, 0.0
        perf = float(
            multihost_utils.broadcast_one_to_all(np.float32(perf))
        )
    else:
        name_values, perf = dataset.evaluate(
            cfg, all_preds[:idx], output_dir, all_boxes[:idx], image_paths,
            indices=all_indices[:idx],
        )
    if isinstance(name_values, list):
        for nv in name_values:
            print_name_value(logger, nv, cfg.MODEL.NAME)
    else:
        print_name_value(logger, name_values, cfg.MODEL.NAME)

    if writer is not None and writer_state is not None:
        gs = writer_state.get("valid_global_steps", 0)
        writer.add_scalar("valid_loss", losses.avg, gs)
        # exact whole-set PCK from the accumulated per-joint counts —
        # split-invariant, unlike a weighted mean of per-batch averages
        pj = np.where(pck_val_tot > 0,
                      pck_hit_tot / np.maximum(pck_val_tot, 1), -1.0)
        have = pj >= 0
        writer.add_scalar(
            "valid_acc", float(pj[have].mean()) if have.any() else 0.0, gs
        )
        writer_state["valid_global_steps"] = gs + 1
    return name_values, perf


def validate_bottomup(
    cfg,
    eval_step,
    params,
    batch_stats,
    dataset,
    loader: Loader,
    mesh,
    output_dir: str,
    detection_thresh: float = 0.1,
    tag_thresh: float = 1.0,
    corruption: str = "",
    severity: int = 0,
):
    """Bottom-up validation: device forward + peak extraction, host AE
    grouping, inverse-affine back-projection, COCO-format results + OKS AP.
    (No reference counterpart — public HigherHRNet recipe; SURVEY §6 gap.)
    """
    import os
    import json as jsonlib

    from ..evaluation.grouping import parse_bottomup
    from ..evaluation.cocoeval_np import COCOKeypointEval, STATS_NAMES
    from ..ops.transforms import get_affine_transform
    from ..ops.augment import IMAGENET_MEAN_STD
    from collections import OrderedDict

    mean, std = IMAGENET_MEAN_STD

    @jax.jit
    def prep(image_u8):
        img = image_u8.astype(jnp.float32)
        if corruption and corruption != "clean":
            # on-the-fly device synthesis (mirrors the top-down sweep path)
            img = corrupt(img, corruption, severity, jax.random.PRNGKey(1),
                          exact_render=True)
        return (img - mean) / std

    results = []
    for host_batch in loader:
        raw = device_put_batch({"image": host_batch["image"]}, mesh)
        batch = {"image": prep(raw["image"])}
        heat, tags, peaks = eval_step(params, batch_stats, batch)
        heat, tags, peaks = jax.device_get((heat, tags, peaks))
        n = host_batch["_n"]
        hm_h, hm_w = heat.shape[1], heat.shape[2]
        for i in range(n):
            pk = {k: peaks[k][i] for k in peaks}
            people, scores = parse_bottomup(
                heat[i], tags[i], pk, detection_thresh, tag_thresh
            )
            if len(people) == 0:
                continue
            c = host_batch["center"][i]
            s = host_batch["scale"][i]
            inv = get_affine_transform(c, s, 0, (hm_w, hm_h), inv=True)
            image_id = int(str(host_batch["image_path"][i])[-16:-4])
            for p, sc in zip(people, scores):
                kps = np.zeros(dataset.num_joints * 3)
                xy = np.concatenate(
                    [p[:, :2], np.ones((p.shape[0], 1))], axis=1
                ) @ inv.T
                kps[0::3] = xy[:, 0]
                kps[1::3] = xy[:, 1]
                kps[2::3] = p[:, 2]
                results.append(
                    dict(image_id=image_id, category_id=1,
                         keypoints=[float(v) for v in kps],
                         score=float(sc))
                )

    res_folder = os.path.join(output_dir, "results")
    os.makedirs(res_folder, exist_ok=True)
    res_file = os.path.join(
        res_folder, f"keypoints_{dataset.image_set}_results_bu.json"
    )
    with open(res_file, "w") as f:
        jsonlib.dump(results, f)

    if "test" in dataset.image_set:
        return {"Null": 0}, 0
    evaluator = COCOKeypointEval(dataset.ann_file, results)
    stats = evaluator.run()
    name_value = OrderedDict(zip(STATS_NAMES, [float(x) for x in stats]))
    print_name_value(logger, name_value, cfg.MODEL.NAME)
    return name_value, name_value["AP"]


def output_dir_of(cfg):
    """Derive the debug-dump dir the same way create_logger does."""
    import os as _os

    return _os.path.join(
        cfg.OUTPUT_DIR or "output", cfg.DATASET.DATASET, cfg.MODEL.NAME,
        "debug",
    )


def _dump_val_debug_images(cfg, host_batch, dev_batch, debug_out, out_dir,
                           i):
    """Validate-time debug dumps (`lib/core/function.py:301-316`): the
    reference saves GT/pred joint overlays + heatmap grids every
    PRINT_FREQ during validate, prefix 'val'."""
    import os as _os

    from ..utils.vis import save_debug_images

    _os.makedirs(out_dir, exist_ok=True)
    prefix = _os.path.join(out_dir, f"val_{i}")
    image_norm = np.asarray(jax.device_get(dev_batch["image"]))
    target = np.asarray(jax.device_get(dev_batch["target"]))
    output = np.asarray(jax.device_get(debug_out["output"]))
    pred = np.asarray(jax.device_get(debug_out["pred_coords"]))
    stride = image_norm.shape[1] / output.shape[1]
    save_debug_images(
        cfg, image_norm, host_batch["joints"], host_batch["joints_vis"],
        target, pred * stride, output, prefix,
    )


def _dump_debug_images(cfg, host_batch, dev_batch, debug_out, out_dir,
                       epoch, i, advmix):
    """Per-PRINT_FREQ debug dumps (reference save_debug_images call sites,
    lib/core/function.py:92-95 and :194-197)."""
    import os as _os

    from ..utils.vis import save_debug_images

    _os.makedirs(out_dir, exist_ok=True)
    prefix = _os.path.join(out_dir, f"train_{epoch}_{i}")
    if advmix:
        views = np.asarray(jax.device_get(dev_batch["views"]))
        image_norm = views[..., :3]
        mixed = np.asarray(jax.device_get(debug_out["mixed"]))
    else:
        image_norm = np.asarray(jax.device_get(dev_batch["image"]))
        mixed = None
    target = np.asarray(jax.device_get(dev_batch["target"]))
    output = np.asarray(jax.device_get(debug_out["output"]))
    pred = np.asarray(jax.device_get(debug_out["pred_coords"]))
    stride = image_norm.shape[1] / output.shape[1]
    save_debug_images(
        cfg, image_norm, host_batch["joints"], host_batch["joints_vis"],
        target, pred * stride, output, prefix,
    )
    if mixed is not None:
        save_debug_images(
            cfg, mixed, host_batch["joints"], host_batch["joints_vis"],
            target, pred * stride, output, prefix + "_mixed",
        )


def make_bottomup_preprocessor(cfg, advmix: bool):
    """Bottom-up batch prep: normalize (or synthesize the 3 views); targets
    are generated inside the step at each output scale."""
    mean, std = IMAGENET_MEAN_STD

    @jax.jit
    def prep(image_u8, joints, joints_vis, key, mask=None):
        img = image_u8.astype(jnp.float32)
        if advmix:
            views = make_advmix_views(img, key)
            out = {"views": views, "joints": joints,
                   "joints_vis": joints_vis}
        else:
            out = {"image": (img - mean) / std, "joints": joints,
                   "joints_vis": joints_vis}
        if mask is not None:  # crowd/unannotated ignore-region valid mask
            out["mask"] = mask
        return out

    return prep


def train_epoch_bottomup(cfg, step_fn, prep_fn, state, loader, mesh, epoch,
                         key, advmix=False):
    """Bottom-up epoch loop (joints stay multi-person; PCK not defined)."""
    batch_time = AverageMeter()
    losses = AverageMeter()
    end = time.time()
    for i, host_batch in enumerate(loader):
        key, sub = jax.random.split(key)
        raw = {
            "image": host_batch["image"],
            "joints": host_batch["joints"],
            "joints_vis": host_batch["joints_vis"],
        }
        if "mask" in host_batch:
            raw["mask"] = host_batch["mask"]
        raw = device_put_batch(raw, mesh)
        batch = prep_fn(raw["image"], raw["joints"], raw["joints_vis"], sub,
                        mask=raw.get("mask"))
        state, metrics = step_fn(state, batch)
        loss_key = "loss_d" if advmix else "loss"
        n = host_batch["_n"]
        losses.update(float(metrics[loss_key]), n)
        batch_time.update(time.time() - end)
        end = time.time()
        if i % cfg.PRINT_FREQ == 0:
            logger.info(
                f"Epoch: [{epoch}][{i}/{len(loader)}]\t"
                f"Time {batch_time.val:.3f}s ({batch_time.avg:.3f}s)\t"
                f"Speed {n / max(batch_time.val, 1e-9):.1f} samples/s\t"
                f"Loss {losses.val:.5f} ({losses.avg:.5f})"
            )
    return state, key
