"""Logging, output-dir taxonomy, meters, metric tables.

Behavioral reference: `lib/utils/utils.py:22-75` (output dir layout
{OUTPUT_DIR}/{dataset}/{model}/{cfg_name}, robustness runs under a separate
output_robustness tree, file+console logging, timestamped tensorboard dir)
and the AverageMeter / markdown metric table of `lib/core/function.py`.
"""

from __future__ import annotations

import logging
import os
import time
from pathlib import Path


def create_logger(cfg, cfg_name: str, phase: str = "train"):
    """Returns (logger, final_output_dir, tb_log_dir)."""
    root_output_dir = Path(cfg.OUTPUT_DIR or "output")
    dataset = cfg.DATASET.DATASET
    model = cfg.MODEL.NAME
    cfg_name = os.path.basename(cfg_name).split(".")[0]

    if cfg.TEST.TEST_ROBUST:
        root_output_dir = Path(str(root_output_dir) + "_robustness")
        final_output_dir = root_output_dir / dataset / model / "test_corruption"
    else:
        final_output_dir = root_output_dir / dataset / model / cfg_name
    final_output_dir.mkdir(parents=True, exist_ok=True)

    time_str = time.strftime("%Y-%m-%d-%H-%M")
    log_file = f"{cfg_name}_{time_str}_{phase}.log"
    final_log_file = final_output_dir / log_file

    logger = logging.getLogger("advmix_tpu")
    logger.setLevel(logging.INFO)
    logger.propagate = False
    logger.handlers.clear()
    fmt = logging.Formatter("%(asctime)-15s %(message)s")
    fh = logging.FileHandler(str(final_log_file))
    fh.setFormatter(fmt)
    ch = logging.StreamHandler()
    ch.setFormatter(fmt)
    logger.addHandler(fh)
    logger.addHandler(ch)

    tb_log_dir = (
        Path(cfg.LOG_DIR or "log")
        / dataset
        / model
        / f"{cfg_name}_{time_str}"
    )
    tb_log_dir.mkdir(parents=True, exist_ok=True)
    return logger, str(final_output_dir), str(tb_log_dir)


class AverageMeter:
    """Running value/avg meter (`lib/core/function.py:383-398`)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val, n=1):
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / self.count if self.count else 0.0


def print_name_value(logger, name_value, full_arch_name: str):
    """Markdown-style metric table (`lib/core/function.py:364-381`)."""
    names = list(name_value.keys())
    values = list(name_value.values())
    logger.info("| Arch " + " ".join(f"| {n}" for n in names) + " |")
    logger.info("|---" * (len(values) + 1) + "|")
    if len(full_arch_name) > 15:
        full_arch_name = full_arch_name[:8] + "..."
    logger.info(
        "| " + full_arch_name + " "
        + " ".join(f"| {v:.3f}" for v in values) + " |"
    )


def get_tb_writer(tb_log_dir: str):
    """tensorboardX writer if available, else a no-op stub."""
    try:
        from tensorboardX import SummaryWriter

        return SummaryWriter(log_dir=tb_log_dir)
    except Exception:

        class _Noop:
            def add_scalar(self, *a, **k):
                pass

            def add_scalars(self, *a, **k):
                pass

            def close(self):
                pass

        return _Noop()
