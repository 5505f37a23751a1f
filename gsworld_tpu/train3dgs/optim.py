"""Per-parameter-group Adam for 3DGS training.

Hyperparameters replicate the reference's OptimizationParams
(gs_utils.py:80-106): position lr 1.6e-4 -> 1.6e-6 exponential decay over
30k steps with a delayed-cosine warm multiplier, feature lr 2.5e-3 (f_rest
/20), opacity 2.5e-2, scaling 5e-3, rotation 1e-3; Adam eps 1e-15 (the
Inria trainer's setting).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from gsworld_tpu.gs.model import GaussianScene


@dataclasses.dataclass(frozen=True)
class OptimizationParams:
    """gs_utils.py:80-106 (training subset)."""

    iterations: int = 30_000
    position_lr_init: float = 1.6e-4
    position_lr_final: float = 1.6e-6
    position_lr_delay_mult: float = 0.01
    position_lr_max_steps: int = 30_000
    feature_lr: float = 2.5e-3
    opacity_lr: float = 2.5e-2
    scaling_lr: float = 5e-3
    rotation_lr: float = 1e-3
    percent_dense: float = 0.01
    lambda_dssim: float = 0.2
    densification_interval: int = 100
    opacity_reset_interval: int = 3_000
    densify_from_iter: int = 500
    densify_until_iter: int = 15_000
    densify_grad_threshold: float = 2e-4


def expon_lr_schedule(lr_init, lr_final, max_steps, delay_mult=0.01,
                      delay_steps=0):
    """The Inria get_expon_lr_func: log-linear interp with a delayed sine
    warmup multiplier."""

    def schedule(step):
        t = jnp.clip(step / max_steps, 0.0, 1.0)
        log_lerp = jnp.exp(jnp.log(lr_init) * (1 - t)
                           + jnp.log(lr_final) * t)
        if delay_steps > 0:
            delay_rate = delay_mult + (1 - delay_mult) * jnp.sin(
                0.5 * jnp.pi * jnp.clip(step / delay_steps, 0, 1))
        else:
            delay_rate = 1.0
        return delay_rate * log_lerp

    return schedule


def make_optimizer(params: OptimizationParams, spatial_lr_scale: float = 1.0):
    """optax optimizer over the trainable GaussianScene fields.

    Returns (optimizer, trainable_labels); semantics/slot_ids are frozen.
    """
    pos_sched = expon_lr_schedule(
        params.position_lr_init * spatial_lr_scale,
        params.position_lr_final * spatial_lr_scale,
        params.position_lr_max_steps,
        params.position_lr_delay_mult)

    def adam(lr):
        return optax.adam(lr, b1=0.9, b2=0.999, eps=1e-15)

    tx = optax.multi_transform(
        {
            "means": adam(pos_sched),
            "sh0": adam(params.feature_lr),
            "shN": adam(params.feature_lr / 20.0),
            "log_scales": adam(params.scaling_lr),
            "quats": adam(params.rotation_lr),
            "logit_opacities": adam(params.opacity_lr),
            "frozen": optax.set_to_zero(),
        },
        param_labels=GaussianScene(
            means="means", sh0="sh0", shN="shN", log_scales="log_scales",
            quats="quats", logit_opacities="logit_opacities",
            semantics="frozen", slot_ids="frozen"),
    )
    return tx
