"""Optimizers and LR schedules.

Behavioral reference: AdvMix `lib/utils/utils.py:78-94` (sgd with
momentum/wd/nesterov, or plain adam at TRAIN.LR) and the per-epoch
MultiStepLR schedulers built at `tools/train.py:272-281` (factor
TRAIN.LR_FACTOR at epochs TRAIN.LR_STEP, reconstructed from last_epoch on
resume).

We use optax with `inject_hyperparams` so the learning rate is a plain
float in the optimizer state: the host updates it once per epoch exactly
like the torch scheduler, and resume just recomputes it from the epoch.
"""

from __future__ import annotations

import optax


def multistep_lr(base_lr: float, lr_step, lr_factor: float, epoch: int) -> float:
    """MultiStepLR value at `epoch` (0-based, matching torch last_epoch)."""
    lr = base_lr
    for milestone in sorted(lr_step):
        if epoch >= milestone:
            lr *= lr_factor
    return lr


def get_optimizer(cfg) -> optax.GradientTransformation:
    """Pose-network optimizer from cfg.TRAIN (`lib/utils/utils.py:78-94`)."""
    if cfg.TRAIN.OPTIMIZER == "sgd":

        def make(learning_rate):
            # torch SGD applies weight decay to the gradient before the
            # momentum buffer — optax trace-after-decay matches.
            return optax.chain(
                optax.add_decayed_weights(cfg.TRAIN.WD),
                optax.trace(
                    decay=cfg.TRAIN.MOMENTUM, nesterov=cfg.TRAIN.NESTEROV
                ),
                optax.scale(-learning_rate),
            )

        return optax.inject_hyperparams(make)(learning_rate=cfg.TRAIN.LR)
    elif cfg.TRAIN.OPTIMIZER == "adam":
        return optax.inject_hyperparams(optax.adam)(learning_rate=cfg.TRAIN.LR)
    raise ValueError(f"unknown optimizer {cfg.TRAIN.OPTIMIZER}")


def get_generator_optimizer(cfg) -> optax.GradientTransformation:
    """G uses the same construction in the reference (`tools/train.py:186`)."""
    return get_optimizer(cfg)


def set_learning_rate(opt_state, lr: float):
    """Return a copy of an inject_hyperparams state with a new LR."""
    import jax.numpy as jnp

    hp = dict(opt_state.hyperparams)
    hp["learning_rate"] = jnp.asarray(lr, jnp.float32)
    return opt_state._replace(hyperparams=hp)


def epoch_lr_update(opt_state, cfg, epoch: int):
    lr = multistep_lr(
        cfg.TRAIN.LR, list(cfg.TRAIN.LR_STEP), cfg.TRAIN.LR_FACTOR, epoch
    )
    return set_learning_rate(opt_state, lr), lr
