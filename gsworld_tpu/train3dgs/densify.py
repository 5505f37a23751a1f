"""Adaptive density control with static shapes: capacity caps + alive masks.

Reference behavior (Inria gaussian_model densify_and_prune, hyperparams at
gs_utils.py:95-101): every ``densification_interval`` steps between
densify_from_iter and densify_until_iter, gaussians whose mean viewspace
gradient exceeds 2e-4 are cloned (small ones) or split in two with scale/1.6
(large ones, original pruned); gaussians with opacity < 0.005 or oversized
are pruned; opacity is clamped down to 0.01 every opacity_reset_interval.

TPU adaptation (SURVEY.md §7.3 item 4): the scene lives in a fixed-capacity
pytree with an ``alive`` mask — pruning clears the mask, densification
writes new gaussians into dead slots (ranked by gradient, budgeted by the
number of free slots).  No recompilation, no dynamic shapes.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from gsworld_tpu.core.maths import inverse_sigmoid, quat_rotate, quat_normalize
from gsworld_tpu.gs.model import GaussianScene


class DensifyState(NamedTuple):
    alive: jnp.ndarray        # (N,) bool
    grad_accum: jnp.ndarray   # (N,) sum of viewspace grad norms
    denom: jnp.ndarray        # (N,) observation counts
    max_radii: jnp.ndarray    # (N,) max screen radius seen


def init_densify_state(n_capacity: int, n_alive: int) -> DensifyState:
    alive = jnp.arange(n_capacity) < n_alive
    z = jnp.zeros(n_capacity, jnp.float32)
    return DensifyState(alive=alive, grad_accum=z, denom=z, max_radii=z)


def accumulate_stats(ds: DensifyState, mean2d_grad, radii) -> DensifyState:
    """Per-render statistics update (visible gaussians only)."""
    seen = radii > 0
    gnorm = jnp.linalg.norm(mean2d_grad, axis=-1)
    return DensifyState(
        alive=ds.alive,
        grad_accum=ds.grad_accum + jnp.where(seen, gnorm, 0.0),
        denom=ds.denom + seen.astype(jnp.float32),
        max_radii=jnp.maximum(ds.max_radii, radii.astype(jnp.float32)),
    )


def pad_scene_capacity(scene: GaussianScene, capacity: int) -> GaussianScene:
    n = scene.num_gaussians
    assert capacity >= n
    pad = capacity - n

    def padf(x, fill=0.0):
        return jnp.concatenate(
            [x, jnp.full((pad,) + x.shape[1:], fill, x.dtype)])

    return GaussianScene(
        means=padf(scene.means),
        sh0=padf(scene.sh0), shN=padf(scene.shN),
        log_scales=padf(scene.log_scales, -10.0),
        quats=padf(scene.quats).at[n:, 0].set(1.0),
        logit_opacities=padf(scene.logit_opacities, -10.0),
        semantics=padf(scene.semantics), slot_ids=padf(scene.slot_ids),
    )


def densify_and_prune(scene: GaussianScene, ds: DensifyState, key,
                      grad_threshold: float = 2e-4,
                      min_opacity: float = 0.005,
                      percent_dense: float = 0.01,
                      scene_extent: float = 3.0,
                      max_screen_size: float = 0.0,
                      ) -> Tuple[GaussianScene, DensifyState]:
    """One densify+prune pass. Fully jittable; capacity is static."""
    N = scene.num_gaussians
    avg_grad = ds.grad_accum / jnp.maximum(ds.denom, 1.0)
    scale_max = jnp.exp(scene.log_scales).max(axis=-1)
    opacity = 1.0 / (1.0 + jnp.exp(-scene.logit_opacities))

    high_grad = (avg_grad > grad_threshold) & ds.alive
    small = scale_max <= percent_dense * scene_extent
    want_clone = high_grad & small
    want_split = high_grad & (~small)

    # prune: low opacity (+ optional screen-size cap)
    prune = ds.alive & (opacity < min_opacity)
    if max_screen_size > 0:
        prune = prune | (ds.max_radii > max_screen_size) | \
            (scale_max > 0.1 * scene_extent)
    alive = ds.alive & (~prune)

    # requests: clones keep params; splits spawn a displaced copy with
    # scale/1.6 and shrink the original in place
    req = want_clone | want_split
    score = jnp.where(req & alive, avg_grad, -jnp.inf)

    # budget = number of dead slots; take the top-K requests (K static = N)
    order = jnp.argsort(-score)                     # best requests first
    dead_order = jnp.argsort(alive.astype(jnp.int32))  # dead slots first
    n_dead = jnp.sum(~alive)
    n_req = jnp.sum(score > -jnp.inf)
    n_new = jnp.minimum(n_dead, n_req)

    src = order                                     # (N,) request ranking
    dst = dead_order                                # (N,) dead slot ranking
    take = jnp.arange(N) < n_new                    # which rank positions fire

    # gather source params
    def g(x):
        return x[src]

    key, sub = jax.random.split(key)
    noise = jax.random.normal(sub, (N, 3))
    src_split = want_split[src]
    src_scales = jnp.exp(scene.log_scales[src])
    disp = quat_rotate(quat_normalize(scene.quats[src]), noise * src_scales)
    new_means = jnp.where(src_split[:, None], scene.means[src] + disp,
                          scene.means[src])
    new_log_scales = jnp.where(
        src_split[:, None],
        scene.log_scales[src] - jnp.log(1.6),
        scene.log_scales[src])

    def scatter(x, new_vals):
        # write new values into dead slots (rank positions that fire)
        safe_dst = jnp.where(take, dst, N)          # OOB -> dropped
        return x.at[safe_dst].set(
            jnp.where(take.reshape((-1,) + (1,) * (x.ndim - 1)),
                      new_vals, x[jnp.minimum(safe_dst, N - 1)]),
            mode="drop")

    scene2 = GaussianScene(
        means=scatter(scene.means, new_means),
        sh0=scatter(scene.sh0, scene.sh0[src]),
        shN=scatter(scene.shN, scene.shN[src]),
        log_scales=scatter(scene.log_scales, new_log_scales),
        quats=scatter(scene.quats, scene.quats[src]),
        logit_opacities=scatter(scene.logit_opacities,
                                scene.logit_opacities[src]),
        semantics=scatter(scene.semantics, scene.semantics[src]),
        slot_ids=scatter(scene.slot_ids, scene.slot_ids[src]),
    )
    # shrink split originals in place
    shrink = want_split & alive
    scene2 = scene2.replace(
        log_scales=jnp.where(shrink[:, None],
                             scene2.log_scales - jnp.log(1.6),
                             scene2.log_scales))
    # new slots become alive
    safe_dst = jnp.where(take, dst, N)
    alive2 = alive.at[safe_dst].set(True, mode="drop")

    # rows whose content is new this pass: freshly written slots, pruned
    # slots, and in-place-shrunk split originals (the Inria trainer prunes
    # split originals and zero-initializes new points' Adam moments —
    # `changed` lets the caller reset exactly those rows' optimizer state
    # instead of re-initializing every gaussian's moments)
    changed = (prune | shrink).at[safe_dst].set(True, mode="drop")

    z = jnp.zeros(N, jnp.float32)
    return scene2, DensifyState(alive=alive2, grad_accum=z, denom=z,
                                max_radii=z), changed


def reset_opacity(scene: GaussianScene, max_opacity: float = 0.01):
    """Clamp opacities down to 0.01 (opacity_reset_interval behavior)."""
    cap = inverse_sigmoid(jnp.asarray(max_opacity))
    return scene.replace(
        logit_opacities=jnp.minimum(scene.logit_opacities, cap))
