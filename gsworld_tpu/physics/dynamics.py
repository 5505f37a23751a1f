"""Articulated rigid-body dynamics in reduced (joint) coordinates.

TPU-native replacement for the PhysX/SAPIEN articulation step the reference
drives through ``env.step`` (SURVEY.md §2.3 row 5).  Design choices:

  * world-frame spatial algebra with the (omega, v_at_origin) twist
    convention; motion subspaces S_i are recomputed from FK each substep;
  * mass matrix via CRBA (composite rigid-body), bias forces (Coriolis,
    centrifugal + gravity) via RNEA with qddot = 0 — both unrolled over the
    (static, small) link count and batched over envs with vmap;
  * PD joint drives with SAPIEN-style stiffness/damping and force limits
    (e.g. fr3: kp=1e3, kd=1e2, limit=100 — fr3_umi.py:57-63), integrated
    implicitly in the damping term for stability at 120 Hz;
  * mimic dofs are hard-slaved (q_m = mult*q_p + offset) and their drive
    torques folded onto the parent dof.

Everything is f32, static shapes, and differentiable.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gsworld_tpu.core.maths import _einsum, quat_to_matrix
from gsworld_tpu.physics.kinematics import ArticulationModel, forward_kinematics
from gsworld_tpu.physics.urdf import JOINT_PRISMATIC, JOINT_REVOLUTE

GRAVITY = jnp.asarray([0.0, 0.0, -9.81])


def _skew(v):
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack([
        jnp.stack([zero, -z, y], -1),
        jnp.stack([z, zero, -x], -1),
        jnp.stack([-y, x, zero], -1),
    ], -2)


class KinState(NamedTuple):
    """Per-substep kinematic quantities derived from qpos."""

    link_pos: jnp.ndarray   # (..., L, 3)
    link_quat: jnp.ndarray  # (..., L, 4)
    S: jnp.ndarray          # (..., dof, 6) motion subspace [omega; v_origin]
    com_w: jnp.ndarray      # (..., L, 3) world COM per link
    Iw: jnp.ndarray         # (..., L, 3, 3) world rotational inertia about COM


def compute_kinematics(model: ArticulationModel, qpos, root_pos=None,
                       root_quat=None) -> KinState:
    link_pos, link_quat = forward_kinematics(model, qpos, root_pos, root_quat)
    R = quat_to_matrix(link_quat)                          # (..., L, 3, 3)
    com_w = link_pos + _einsum("...lij,lj->...li", R, jnp.asarray(model.com_pos))
    Iw = _einsum("...lij,ljk,...lmk->...lim", R,
                 jnp.asarray(model.inertia), R)

    # motion subspace per dof, in world frame at the world origin
    dof_link = jnp.asarray(model.dof_link)                 # (dof,)
    jp = link_pos[..., dof_link, :]                        # joint frame pos
    jR = R[..., dof_link, :, :]
    axis_w = _einsum("...dij,dj->...di", jR, jnp.asarray(model.axis)[model.dof_link])
    is_rev = jnp.asarray(
        model.jtype[model.dof_link] == JOINT_REVOLUTE)[..., :, None]
    S_ang = jnp.where(is_rev, axis_w, 0.0)
    S_lin = jnp.where(is_rev, jnp.cross(jp, axis_w), axis_w)
    S = jnp.concatenate([S_ang, S_lin], axis=-1)           # (..., dof, 6)
    return KinState(link_pos=link_pos, link_quat=link_quat, S=S,
                    com_w=com_w, Iw=Iw)


def _spatial_inertia(model: ArticulationModel, kin: KinState):
    """World-frame 6x6 spatial inertia per link (about the world origin)."""
    m = jnp.asarray(np.maximum(model.mass, 1e-6))          # avoid singular M
    c = kin.com_w
    cx = _skew(c)
    mI3 = m[..., :, None, None] * jnp.eye(3)
    top_left = kin.Iw - m[..., :, None, None] * (cx @ cx)
    top_right = m[..., :, None, None] * cx
    bot_left = -top_right
    top = jnp.concatenate([top_left, top_right], axis=-1)
    bot = jnp.concatenate([bot_left, mI3], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)            # (..., L, 6, 6)


def _ancestor_dofs(model: ArticulationModel):
    """Static (L, dof) bool: dof j is on the path from root to link i."""
    L, nd = model.num_links, model.dof
    anc = np.zeros((L, nd), bool)
    for i in range(L):
        k = i
        while k >= 0:
            d = model.dof_index[k]
            if d >= 0:
                anc[i, d] = True
            k = model.parent[k]
    return anc


def mass_matrix(model: ArticulationModel, kin: KinState):
    """CRBA in world coordinates: M[a, b] = S_a^T (sum_{links below both}
    I_link) S_b."""
    Isp = _spatial_inertia(model, kin)                     # (..., L, 6, 6)
    anc = jnp.asarray(_ancestor_dofs(model), jnp.float32)  # (L, dof)
    # IC[d] = sum over links whose path contains dof d
    IC = _einsum("...lij,ld->...dij", Isp, anc)            # (..., dof, 6, 6)
    # pair mask: dofs a,b both on path of some link <-> one is ancestor of
    # the other; the composite about the deeper dof applies.
    # M[a,b] = S_a^T IC[max_depth(a,b)] S_b, 0 if not on one chain.
    # Build with a static double loop over dofs (dof <= 13).
    nd = model.dof
    anc_np = _ancestor_dofs(model)
    # dof a is ancestor-or-equal of dof b iff a is on the path of b's link
    a_of_b = np.zeros((nd, nd), bool)
    for b in range(nd):
        a_of_b[:, b] = anc_np[model.dof_link[b]]
    rows = []
    for a in range(nd):
        row = []
        for b in range(nd):
            if a_of_b[a, b]:       # a ancestor of b: composite at b
                deep = b
            elif a_of_b[b, a]:
                deep = a
            else:
                row.append(None)
                continue
            row.append((deep,))
        rows.append(row)
    Sv = kin.S
    M = jnp.zeros(Sv.shape[:-2] + (nd, nd), Sv.dtype)
    for a in range(nd):
        for b in range(a, nd):
            cell = rows[a][b]
            if cell is None:
                continue
            deep = cell[0]
            val = _einsum("...i,...ij,...j->...",
                          Sv[..., a, :], IC[..., deep, :, :], Sv[..., b, :])
            M = M.at[..., a, b].set(val)
            if a != b:
                M = M.at[..., b, a].set(val)
    return M


def bias_forces(model: ArticulationModel, kin: KinState, qvel,
                gravity=GRAVITY):
    """RNEA with qddot = 0: returns tau_bias (..., dof) such that
    M qddot + tau_bias = tau_applied."""
    L = model.num_links
    nd = model.dof
    Isp = _spatial_inertia(model, kin)
    S = kin.S

    zero6 = jnp.zeros(qvel.shape[:-1] + (6,), qvel.dtype)
    # gravity trick: root "accelerates" upward at -g
    a_root = zero6.at[..., 3:].set(-jnp.asarray(gravity))

    V = [None] * L
    A = [None] * L
    V[0] = zero6
    A[0] = a_root
    for i in range(1, L):
        p = int(model.parent[i])
        d = int(model.dof_index[i])
        if d < 0:
            V[i] = V[p]
            A[i] = A[p]
            continue
        Si = S[..., d, :]
        qd = qvel[..., d:d + 1]
        Vj = Si * qd
        V[i] = V[p] + Vj
        # bias acceleration: a = a_p + V_i x_m (S qd)
        w, v = V[i][..., :3], V[i][..., 3:]
        wj, vj = Vj[..., :3], Vj[..., 3:]
        cross_m = jnp.concatenate(
            [jnp.cross(w, wj), jnp.cross(v, wj) + jnp.cross(w, vj)], axis=-1)
        A[i] = A[p] + cross_m

    F = [None] * L
    for i in range(L):
        IA = _einsum("...ij,...j->...i", Isp[..., i, :, :], A[i])
        IV = _einsum("...ij,...j->...i", Isp[..., i, :, :], V[i])
        w, v = V[i][..., :3], V[i][..., 3:]
        hw, hv = IV[..., :3], IV[..., 3:]
        # force-space cross: V x* h = [w x hw + v x hv ; w x hv]
        cross_f = jnp.concatenate(
            [jnp.cross(w, hw) + jnp.cross(v, hv), jnp.cross(w, hv)], axis=-1)
        F[i] = IA + cross_f

    # backward accumulate subtree wrenches
    Facc = list(F)
    for i in range(L - 1, 0, -1):
        p = int(model.parent[i])
        Facc[p] = Facc[p] + Facc[i]

    tau = []
    for d in range(nd):
        li = int(model.dof_link[d])
        tau.append(jnp.sum(S[..., d, :] * Facc[li], axis=-1))
    return jnp.stack(tau, axis=-1)


def pd_torque(model: ArticulationModel, qpos, qvel, q_target, kp, kd,
              force_limit):
    """SAPIEN-style PD drive torque with force limit; mimic dofs contribute
    their torque to the parent dof (approximating the mimic constraint)."""
    tau = kp * (q_target - qpos) - kd * qvel
    tau = jnp.clip(tau, -force_limit, force_limit)
    mp = model.mimic_parent
    if (mp >= 0).any():
        mp_j = jnp.asarray(np.maximum(mp, 0))
        mult = jnp.asarray(model.mimic_mult)
        is_m = jnp.asarray(mp >= 0)
        # fold mimic torques onto parents (scaled by multiplier)
        folded = jnp.zeros_like(tau)
        folded = folded.at[..., mp_j].add(jnp.where(is_m, tau * mult, 0.0))
        tau = jnp.where(is_m, 0.0, tau) + folded
    return tau


def implicit_pd_velocity(model: ArticulationModel, M, bias, qpos, qvel,
                         q_target, kp, kd, force_limit, h: float,
                         tau_external=None):
    """Force-limited implicit PD velocity update.

    PhysX clamps the *total* drive force kp(q*-q) - kd qd to +-limit; a naive
    implicit formulation instead keeps full kd damping in the system matrix,
    which freezes joints whose required force far exceeds the limit (e.g. the
    xarm gripper: kp=1e5 with limit=0.1, xarm6_uf_gripper.py:129-131).  We
    solve once with full gains, estimate the implied drive force, scale each
    dof's (kp, kd) by min(1, limit/|force|), and re-solve — approximating the
    saturated drive while staying implicit (stable) in the unsaturated ones.

    Returns (qvel_new, Minv_eff) with Minv_eff the inverse of the effective
    system matrix (used by the contact solver as the impulse response).
    """

    def solve(kp_e, kd_e):
        tau = pd_torque(model, qpos, qvel, q_target, kp_e, kd_e,
                        jnp.asarray(force_limit))
        if tau_external is not None:
            tau_t = tau + tau_external
        else:
            tau_t = tau
        damp = kd_e + jnp.asarray(model.damping)
        A = M + h * jnp.eye(model.dof) * damp
        Minv = jnp.linalg.inv(A)
        qv = qvel + Minv @ (h * (tau_t - bias))
        return qv, Minv

    kp = jnp.broadcast_to(jnp.asarray(kp, jnp.float32), (model.dof,))
    kd = jnp.broadcast_to(jnp.asarray(kd, jnp.float32), (model.dof,))
    fl = jnp.broadcast_to(jnp.asarray(force_limit, jnp.float32), (model.dof,))

    qv1, _ = solve(kp, kd)
    tau_impl = kp * (q_target - qpos) - kd * qv1
    scale = jnp.minimum(1.0, fl / jnp.maximum(jnp.abs(tau_impl), 1e-9))
    return solve(kp * scale, kd * scale)


def slave_mimics(model: ArticulationModel, qpos, qvel):
    mp = model.mimic_parent
    if not (mp >= 0).any():
        return qpos, qvel
    mp_j = jnp.asarray(np.maximum(mp, 0))
    mult = jnp.asarray(model.mimic_mult)
    off = jnp.asarray(model.mimic_offset)
    is_m = jnp.asarray(mp >= 0)
    qpos = jnp.where(is_m, mult * qpos[..., mp_j] + off, qpos)
    qvel = jnp.where(is_m, mult * qvel[..., mp_j], qvel)
    return qpos, qvel


def step_articulation_free(model: ArticulationModel, qpos, qvel, q_target,
                           kp, kd, force_limit, h: float,
                           tau_external=None,
                           root_pos=None, root_quat=None,
                           gravity=GRAVITY):
    """One contact-free articulation substep (implicit-damping Euler).

    Solves (M + h*diag(kd + joint_damping)) dv = h * (tau_pd + tau_ext - bias)
    then integrates. Returns (qpos', qvel', kin_state_before_integration).
    """
    kin = compute_kinematics(model, qpos, root_pos, root_quat)
    M = mass_matrix(model, kin)
    bias = bias_forces(model, kin, qvel, gravity)
    qvel_new, _ = implicit_pd_velocity(
        model, M, bias, qpos, qvel, q_target, kp, kd, force_limit, h,
        tau_external=tau_external)
    # velocity limits (URDF)
    vmax = jnp.asarray(model.velocity)
    qvel_new = jnp.clip(qvel_new, -vmax, vmax)
    qpos_new = qpos + h * qvel_new
    lo = jnp.asarray(model.qlimits[:, 0])
    hi = jnp.asarray(model.qlimits[:, 1])
    qpos_new = jnp.clip(qpos_new, lo, hi)
    # joint-limit contact: zero inward velocity at the stops
    qvel_new = jnp.where((qpos_new <= lo) & (qvel_new < 0), 0.0, qvel_new)
    qvel_new = jnp.where((qpos_new >= hi) & (qvel_new > 0), 0.0, qvel_new)
    qpos_new, qvel_new = slave_mimics(model, qpos_new, qvel_new)
    return qpos_new, qvel_new, kin
