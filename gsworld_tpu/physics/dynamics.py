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
    """CRBA in world coordinates as ONE dense contraction.

    M[a, b] = sum over links l carrying both dofs on their root path of
    S_a^T I_l S_b  =  sum_l (anc_l . S)^T I_l (anc_l . S) — so with the
    static ancestor mask X_{l,d,:} = anc[l, d] * S_d the whole matrix is a
    single einsum.  (The naive per-cell double loop emits ~200 tiny TPU
    kernels; this emits 2.)
    """
    Isp = _spatial_inertia(model, kin)                     # (..., L, 6, 6)
    anc = jnp.asarray(_ancestor_dofs(model), jnp.float32)  # (L, dof)
    X = anc[..., :, :, None] * kin.S[..., None, :, :]      # (..., L, dof, 6)
    return _einsum("...lai,...lij,...lbj->...ab", X, Isp, X)


def bias_forces(model: ArticulationModel, kin: KinState, qvel,
                gravity=GRAVITY):
    """RNEA with qddot = 0 as a handful of dense batched contractions.

    With the static ancestor mask anc (L, dof), the recursions flatten:
      V_l = sum_d anc[l,d] S_d qd_d
      A_l = a_root + sum_d anc[l,d] (V_{link(d)} x_m S_d qd_d)
      F_l = I_l A_l + V_l x* (I_l V_l)
      tau_d = S_d . sum_l anc[l,d] F_l        (l in subtree(d) <=> anc[l,d])
    (The per-link python loops emitted ~10 tiny kernels per link; this is
    ~8 fused ops total.)
    """
    Isp = _spatial_inertia(model, kin)                 # (..., L, 6, 6)
    S = kin.S                                          # (..., dof, 6)
    anc = jnp.asarray(_ancestor_dofs(model), jnp.float32)

    Sq = S * qvel[..., :, None]                        # (..., dof, 6)
    V = _einsum("ld,...di->...li", anc, Sq)            # (..., L, 6)

    def cross_m(a, b):
        # motion cross: [wa x wb ; va x wb + wa x vb]
        wa, va = a[..., :3], a[..., 3:]
        wb, vb = b[..., :3], b[..., 3:]
        return jnp.concatenate(
            [jnp.cross(wa, wb), jnp.cross(va, wb) + jnp.cross(wa, vb)],
            axis=-1)

    def cross_f(a, h):
        # force cross: [wa x hw + va x hv ; wa x hv]
        wa, va = a[..., :3], a[..., 3:]
        hw, hv = h[..., :3], h[..., 3:]
        return jnp.concatenate(
            [jnp.cross(wa, hw) + jnp.cross(va, hv), jnp.cross(wa, hv)],
            axis=-1)

    V_of_dof = V[..., jnp.asarray(model.dof_link), :]  # (..., dof, 6)
    c = cross_m(V_of_dof, Sq)                          # (..., dof, 6)
    a_root = jnp.zeros_like(V[..., :1, :]).at[..., 0, 3:].set(
        -jnp.asarray(gravity))
    A = a_root + _einsum("ld,...di->...li", anc, c)    # (..., L, 6)

    IA = _einsum("...lij,...lj->...li", Isp, A)
    IV = _einsum("...lij,...lj->...li", Isp, V)
    F = IA + cross_f(V, IV)                            # (..., L, 6)

    return _einsum("ld,...li,...di->...d", anc, F, S)


def mimic_basis(model: ArticulationModel) -> np.ndarray:
    """Static (dof, dof) mimic reduction basis T: full coords = T @ full
    coords restricted to independent dofs.  Independent dof columns are
    unit vectors; a follower dof's row carries ``mult`` in its parent's
    column and its own column is zero.  Projecting the dynamics through T
    (M_r = T^T M T, tau_r = T^T tau) is what makes PD drives AND contact
    impulses consistent with the hard mimic constraint — solving in full
    coordinates and overwriting followers afterwards lets the contact
    solver 'satisfy' constraints with follower motion that slave_mimics
    then destroys (the gripper squeeze bug, test_xarm_agent.py)."""
    nd = model.dof
    T = np.eye(nd)
    mp = model.mimic_parent
    for f in range(nd):
        if mp[f] >= 0:
            T[f, f] = 0.0
            T[f, mp[f]] = model.mimic_mult[f]
    return T


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

    Mimic dofs are eliminated through the reduction basis T (mimic_basis):
    the returned impulse response is P = T (T^T A T)^-1 T^T, so generalized
    forces on followers fold onto their parents and resulting velocities
    always satisfy qvel_f = mult * qvel_p.

    Returns (qvel_new, Minv_eff) with Minv_eff = P, the impulse response
    used by the contact solver.
    """
    T = jnp.asarray(mimic_basis(model), jnp.float32)
    has_mimic = bool((model.mimic_parent >= 0).any())
    follower = jnp.asarray(model.mimic_parent >= 0, jnp.float32)

    def project_inv(A):
        if not has_mimic:
            return jnp.linalg.inv(A)
        Ar = T.T @ A @ T + jnp.diag(follower)   # follower cols are zero
        return T @ jnp.linalg.inv(Ar) @ T.T

    def solve(kp_e, kd_e):
        tau = kp_e * (q_target - qpos) - kd_e * qvel
        tau = jnp.clip(tau, -jnp.asarray(force_limit),
                       jnp.asarray(force_limit))
        if tau_external is not None:
            tau = tau + tau_external
        damp = kd_e + jnp.asarray(model.damping)
        A = M + h * jnp.eye(model.dof) * damp
        Minv = project_inv(A)
        # joint damping must also oppose the *current* velocity, not only
        # velocity change: (M + h(kd+d)) dv = h (tau - d qvel - bias), the
        # SAPIEN/PhysX joint-damping semantics (ADVICE r1)
        tau_t = tau - jnp.asarray(model.damping) * qvel
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
