"""Train state containers (flax struct pytrees)."""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class PoseState:
    """State for standard training: one pose network + optimizer."""

    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray


@struct.dataclass
class AdvMixState:
    """State for AdvMix min-max training.

    D = pose network ("discriminator"), G = UNet generator, teacher = frozen
    copy of the pretrained pose net (eval mode, KD target) — mirroring the
    three models built at `tools/train.py:64-69`.
    """

    params_d: Any
    batch_stats_d: Any
    opt_state_d: Any
    params_g: Any
    opt_state_g: Any
    params_t: Any
    batch_stats_t: Any
    step: jnp.ndarray


def create_pose_state(model, tx, rng, sample_input) -> PoseState:
    variables = model.init(rng, sample_input, train=False)
    params = variables["params"]
    return PoseState(
        params=params,
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(params),
        step=jnp.zeros((), jnp.int32),
    )


def create_advmix_state(
    model_d, model_g, tx_d, tx_g, rng, sample_input, gen_input_chn: int = 9
) -> AdvMixState:
    rng_d, rng_g = jax.random.split(rng)
    vd = model_d.init(rng_d, sample_input, train=False)
    b, h, w, _ = sample_input.shape
    vg = model_g.init(rng_g, jnp.zeros((b, h, w, gen_input_chn)))
    # teacher starts as a deepcopy of D (`tools/train.py:65`); both are then
    # typically overwritten by the fine-tune checkpoint load.
    return AdvMixState(
        params_d=vd["params"],
        batch_stats_d=vd.get("batch_stats", {}),
        opt_state_d=tx_d.init(vd["params"]),
        params_g=vg["params"],
        opt_state_g=tx_g.init(vg["params"]),
        # real copies: the step donates its input state, and aliased D/teacher
        # buffers would be donated twice
        params_t=jax.tree.map(jnp.copy, vd["params"]),
        batch_stats_t=jax.tree.map(jnp.copy, vd.get("batch_stats", {})),
        step=jnp.zeros((), jnp.int32),
    )
