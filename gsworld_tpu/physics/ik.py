"""Differential inverse kinematics: damped-least-squares over the FK
Jacobian.

TPU-native replacement for mplib's screw-motion IK (SURVEY.md §2.3 row 6:
host-side planning is fine; this is still pure jnp so it also runs jitted
for the pd_ee_delta_* controllers).  The Jacobian comes from autodiff of FK
— exact, no finite differences.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gsworld_tpu.core.maths import (
    quat_conjugate,
    quat_multiply,
    quat_normalize,
)
from gsworld_tpu.physics.kinematics import ArticulationModel, forward_kinematics


def ee_pose_fn(model: ArticulationModel, ee_link: str):
    ee_id = model.link_id(ee_link)

    def f(qpos, root_pos=None, root_quat=None):
        pos, quat = forward_kinematics(model, qpos, root_pos, root_quat)
        return pos[..., ee_id, :], quat[..., ee_id, :]

    return f


def pose_error(p, q, p_t, q_t):
    """6D pose error (position + rotation-vector) from current to target."""
    dq = quat_multiply(q_t, quat_conjugate(quat_normalize(q)))
    dq = jnp.where(dq[..., :1] < 0, -dq, dq)
    # small-angle rotation vector: 2 * vec part (exact enough near target;
    # scaled by angle/sin for larger errors)
    w = jnp.clip(dq[..., 0], -1.0, 1.0)
    angle = 2.0 * jnp.arccos(w)
    s = jnp.sqrt(jnp.maximum(1.0 - w * w, 1e-12))
    axis = dq[..., 1:] / s[..., None]
    rotvec = jnp.where(angle[..., None] < 1e-6, 2.0 * dq[..., 1:],
                       axis * angle[..., None])
    return jnp.concatenate([p_t - p, rotvec], axis=-1)


def solve_ik(model: ArticulationModel, ee_link: str, target_pos, target_quat,
             q_init, active_dofs: Tuple[int, ...],
             root_pos=None, root_quat=None,
             iters: int = 64, damping: float = 1e-3,
             step: float = 1.0, pos_tol: float = 1e-4,
             rot_tol: float = 1e-3):
    """Damped least-squares IK on the selected dofs.

    Returns (qpos, converged). Pure jnp; jit-compatible with static
    active_dofs/iters.
    """
    fk = ee_pose_fn(model, ee_link)
    act = jnp.asarray(active_dofs)
    lo = jnp.asarray(model.qlimits[np.asarray(active_dofs), 0])
    hi = jnp.asarray(model.qlimits[np.asarray(active_dofs), 1])

    def err_of(qa, q_full):
        q = q_full.at[act].set(qa)
        p, quat = fk(q, root_pos, root_quat)
        return pose_error(p, quat, target_pos, target_quat)

    def body(i, carry):
        q_full, _ = carry
        qa = q_full[act]
        e = err_of(qa, q_full)
        J = jax.jacfwd(lambda qq: err_of(qq, q_full))(qa)   # (6, na)
        JJt = J @ J.T + damping * jnp.eye(6)
        # err measures remaining displacement (J = -J_fk), so descend -J+e
        dq = -J.T @ jnp.linalg.solve(JJt, e)
        qa = jnp.clip(qa + step * dq, lo, hi)
        return q_full.at[act].set(qa), e

    q_full, _ = jax.lax.fori_loop(0, iters, body,
                                  (jnp.asarray(q_init), jnp.zeros(6)))
    # convergence from the POST-update error (the loop carry holds the
    # error of the penultimate iterate)
    e = err_of(q_full[act], q_full)
    converged = ((jnp.linalg.norm(e[:3]) < pos_tol * 10)
                 & (jnp.linalg.norm(e[3:]) < rot_tol * 10))
    return q_full, converged
