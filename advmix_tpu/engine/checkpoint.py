"""Checkpointing with orbax.

Behavioral reference: `save_checkpoint` (`lib/utils/utils.py:97-108`) and the
AUTO_RESUME logic at `tools/train.py:238-269`: per-epoch checkpoint files
with `_D`/`_G` suffixes, `model_best_*` snapshots, a final raw-weights
export, and fine-tune loading with shape-filtered partial state dicts
(`tools/train.py:198-235`, handled by models/torch_convert.py for torch
files and by orbax restore for native ones).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def _to_numpy_tree(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


class CheckpointManager:
    """Writes {output_dir}/checkpoint/<step in epochs> with the full train
    state + metadata, plus best-model snapshots.

    Saves are ASYNCHRONOUS (orbax AsyncCheckpointer): the device->host
    copy happens synchronously but serialization/IO overlaps the next
    epoch's training — per-epoch saves measured ~6 s synchronous on the
    demo workload, which would otherwise be dead step time. The next
    save (or `wait()`/`restore`) barriers on the previous one."""

    def __init__(self, output_dir: str, async_save: bool = True):
        self.dir = os.path.abspath(os.path.join(output_dir, "checkpoint"))
        os.makedirs(self.dir, exist_ok=True)
        self._ckpt = ocp.PyTreeCheckpointer()
        self._async = (
            ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler())
            if async_save else None
        )
        self._pending_latest: Optional[int] = None

    def wait(self):
        """Barrier any in-flight async save, then publish its LATEST
        marker (LATEST is only ever written AFTER the payload commit, so
        a crash mid-save cannot leave it pointing at a partial dir)."""
        if self._async is not None:
            self._async.wait_until_finished()
        if self._pending_latest is not None:
            with open(os.path.join(self.dir, "LATEST"), "w") as f:
                f.write(str(self._pending_latest))
            self._pending_latest = None

    def save(self, epoch: int, state, perf: float, is_best: bool,
             extra: Optional[dict] = None):
        payload = {
            "epoch": np.int32(epoch),
            "perf": np.float64(perf),
            "state": _to_numpy_tree(state),
        }
        if extra:
            payload["extra"] = _to_numpy_tree(extra)
        path = os.path.join(self.dir, f"epoch_{epoch:04d}")
        self.wait()  # one in-flight save at a time; publish previous
        if is_best:
            # best snapshots stay synchronous (simple, and a minority of
            # epochs once training stabilizes)
            self._ckpt.save(os.path.join(self.dir, "best"), payload,
                            force=True)
        if self._async is not None:
            self._async.save(path, payload, force=True)
            self._pending_latest = epoch
        else:
            self._ckpt.save(path, payload, force=True)
            with open(os.path.join(self.dir, "LATEST"), "w") as f:
                f.write(str(epoch))

    def latest_epoch(self) -> Optional[int]:
        self.wait()
        latest = os.path.join(self.dir, "LATEST")
        if not os.path.exists(latest):
            return None
        with open(latest) as f:
            return int(f.read().strip())

    def restore(self, epoch: Optional[int] = None, item=None) -> Optional[dict]:
        """Restore a checkpoint payload; `item` provides the pytree structure
        (the current state) so arrays land with the right types."""
        self.wait()
        if epoch is None:
            epoch = self.latest_epoch()
            if epoch is None:
                return None
        path = os.path.join(self.dir, f"epoch_{epoch:04d}")
        if not os.path.isdir(path):
            return None
        if item is not None:
            template = {
                "epoch": np.int32(0),
                "perf": np.float64(0),
                "state": _to_numpy_tree(item),
            }
            try:
                return self._ckpt.restore(path, item=template)
            except Exception:
                return self._ckpt.restore(path)
        return self._ckpt.restore(path)


def export_final_state(output_dir: str, variables, name: str = "final_state"):
    """Final raw-weights export (`tools/train.py:331-337`).

    Repo-wide payload convention: the FULL variables dict
    {"params": ..., "batch_stats": ...} — the reference's
    `model.state_dict()` includes BN running stats, so a params-only
    export would eval with random-init batch statistics."""
    if "params" not in variables:
        raise ValueError(
            "export_final_state expects the full variables dict "
            "{'params': ..., 'batch_stats': ...}, got keys "
            f"{list(variables)}"
        )
    path = os.path.join(output_dir, name)
    ocp.PyTreeCheckpointer().save(
        os.path.abspath(path), _to_numpy_tree(variables), force=True
    )
    return path


def load_final_state(path: str, init_variables: dict) -> dict:
    """Restore a final_state orbax dir into a variables dict.

    Accepts both payload shapes: the current full-variables convention
    and legacy bare-params trees (for which batch_stats falls back to
    `init_variables` — loudly, since untrained BN stats produce garbage
    for BN models)."""
    import logging

    restored = ocp.PyTreeCheckpointer().restore(os.path.abspath(path))
    if isinstance(restored, dict) and "params" in restored:
        stats = restored.get("batch_stats",
                             init_variables.get("batch_stats", {}))
        return {"params": restored["params"], "batch_stats": stats}
    # legacy bare-params payload
    init_stats = init_variables.get("batch_stats", {})
    if jax.tree.leaves(init_stats):
        logging.getLogger("advmix_tpu").warning(
            "final_state at %s holds bare params (legacy layout); "
            "batch_stats falls back to INIT values — BN models will "
            "produce wrong outputs unless stats are loaded separately",
            path,
        )
    return {"params": restored, "batch_stats": init_stats}


def load_torch_checkpoint(path: str, variables: dict, strict: bool = False,
                          pretrained_layers=None):
    """Load a torch .pth checkpoint into flax variables (fine-tune path,
    `tools/train.py:198-235`).

    Scanned (USE_SCAN) variables are handled by unstacking to the
    torch-key-mirroring layout, key-mapping, then restacking — so the
    headline AdvMix recipe (`--load_from_D` on a USE_SCAN config) loads
    every key. Raises if nothing matched (a silently random-init fine-tune
    is always a wiring bug); logs unmatched-key counts loudly otherwise."""
    import logging

    import torch

    from ..models.torch_convert import (
        is_scanned,
        stack_for_scan,
        torch_to_flax_variables,
        unstack_from_scan,
    )

    logger = logging.getLogger(__name__)

    payload = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(payload, dict) and "state_dict" in payload:
        payload = payload["state_dict"]
    if isinstance(payload, dict) and "best_state_dict" in payload:
        payload = payload["best_state_dict"]

    scanned = is_scanned(variables.get("params", {}))
    if scanned:
        template = variables
        variables = {k: unstack_from_scan(v) for k, v in variables.items()}

    loaded, report = torch_to_flax_variables(
        payload, variables, strict=strict,
        pretrained_layers=pretrained_layers, return_report=True,
    )

    if scanned:
        loaded = {
            k: stack_for_scan(loaded[k], template[k])
            for k in loaded
        }

    if report["matched"] == 0:
        raise KeyError(
            f"torch checkpoint {path}: 0 of "
            f"{report['matched'] + len(report['misses'])} keys matched the "
            f"model — wrong architecture or naming drift "
            f"(first misses: {report['misses'][:5]})"
        )
    if report["misses"]:
        logger.warning(
            "torch checkpoint %s: %d keys matched, %d UNMATCHED (dropped): "
            "%s%s", path, report["matched"], len(report["misses"]),
            report["misses"][:10],
            " ..." if len(report["misses"]) > 10 else "",
        )
    else:
        logger.info("torch checkpoint %s: all %d keys matched%s",
                    path, report["matched"],
                    f" ({len(report['filtered'])} filtered by "
                    f"PRETRAINED_LAYERS)" if report["filtered"] else "")
    return loaded
