"""The physics world: articulation + free rigid actors + contacts, stepped
as one fused, batched XLA program.

Replaces the PhysX/SAPIEN step the reference calls into per control step
(SURVEY.md §3.1: controller.set_drive_targets -> physx substeps).  One
control step = ``sim_freq/control_freq`` substeps via ``lax.scan``; each
substep:

  1. articulation free dynamics (CRBA/RNEA + implicit PD, dynamics.py)
  2. actor free velocities (gravity)
  3. contact generation (contact.py) between static pair lists
  4. unified velocity-level solve: projected *Jacobi* iterations with
     under-relaxation over all contact rows at once — chosen over PhysX's
     sequential Gauss-Seidel because it vectorizes across rows/envs on the
     VPU with no sequential chain (SURVEY.md §7.3 item 3); Coulomb friction
     via box clamp, Baumgarte position stabilization
  5. semi-implicit Euler integration of joints and actor poses

Per-pair contact forces are accumulated and exposed for grasp checks
(reference: get_pairwise_contact_forces in is_grasping, fr3_umi.py:152-180).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from gsworld_tpu.core.maths import _einsum, quat_multiply, quat_normalize
from gsworld_tpu.physics import contact as C
from gsworld_tpu.physics import dynamics as D
from gsworld_tpu.physics.kinematics import ArticulationModel

# ---------------------------------------------------------------------- #
# Static scene description
# ---------------------------------------------------------------------- #


@dataclasses.dataclass(frozen=True)
class ActorTable:
    """Static data for free rigid actors, stacked (A actors, K support
    points, F hull faces; K/F padded per actor)."""

    names: Tuple[str, ...]
    mass: np.ndarray       # (A,)
    inertia: np.ndarray    # (A, 3, 3) body frame about COM (COM = body origin)
    sup_pts: np.ndarray    # (A, K, 3)
    faces: np.ndarray      # (A, F, 4)
    friction: np.ndarray   # (A,)

    @property
    def num(self) -> int:
        return len(self.names)


@dataclasses.dataclass(frozen=True)
class SolverParams:
    # with the exact normal presolve carrying the stiff direction, the
    # Jacobi loop only converges friction + coupling; undamped steps with
    # mass-splitting are stable, and ~30 iterations are what the
    # grasp-hold friction impulse needs to build (test_xarm_agent.py)
    iterations: int = 32
    relaxation: float = 1.0
    baumgarte: float = 0.1
    slop: float = 0.005
    # cap on Baumgarte push-out velocity. Kept LOW (PhysX exposes the same
    # knob as maxDepenetrationVelocity): large values eject objects
    # squeezed by force-limited PD grippers (watermelon-seed limit cycle);
    # 0.05 m/s holds grasps steady (20/20 is_grasping over a 0.5 s hold)
    # at the cost of slower recovery from deep spawn penetration.
    max_pen_vel: float = 0.05
    # PhysX-style contact-patch reduction: keep the N deepest points per
    # collision pair. Fewer rows per body = a larger mass-splitting step
    # per Jacobi iteration (split = 1/rows-on-body), which is what lets
    # grasps converge instead of fluttering; also fewer rows to solve.
    contact_patch: int = 6
    # Speculative contact offset (PhysX contactOffset, default 0.02 there):
    # rows activate while still `contact_margin` apart, with a NEGATIVE
    # Baumgarte bias b = pen/h that allows approach exactly to touching.
    # Without it, a PD-driven finger closing at 0.4 m/s tunnels 4 mm per
    # substep before any vertex registers, and the solver then sees a
    # single-point patch whose only consistent answer is spinning the 4 g
    # object out of the gap (measured: fingers ground 1.5 cm into a DTC
    # can with the LCP "solved" at every substep).  The margin both stops
    # the approach at the surface and activates the neighboring hull
    # vertices, so the patch has enough rows to block the rotation escape.
    contact_margin: float = 0.008
    # SAT axis preference for link-actor pairs: the directed query whose
    # winning face is a polygonal ACTOR facet only wins the pair's shared
    # normal if it is shallower than the flat LINK face axis by more than
    # this.  A convex-mesh can held between flat fingers otherwise flips
    # to a facet normal tilted up to half the facet angle (measured
    # [-0.11,-0.99,0.03] vs the finger's [0,-1,-0.01]); a 19 N squeeze
    # along a 6 degree tilted axis puts ~2 N of unopposed sideways force
    # on a 4 g object — the watermelon-seed launch that ejected grasped
    # cans at 4-9 m/s.  PhysX's PCM face selection applies the same kind
    # of reference-face stickiness.
    link_face_pref: float = 0.003
    # Safety valve (PhysX maxDepenetrationVelocity/maxContactImpulse
    # spirit): if the exact normal presolve + friction stage would change
    # a free actor's linear velocity by more than |v_free| + max_kick_lin
    # (or angular by |w_free| + max_kick_ang), its rows fall back to the
    # gated warm start and the monotone Jacobi polish handles that
    # substep.  Catches ill-conditioned active sets (near-parallel
    # opposing rows on a light body at SAT axis flips) whose exact solve
    # emits huge near-cancelling impulses with m/s-scale residuals.
    max_kick_lin: float = 0.5
    max_kick_ang: float = 25.0
    # Friction stage of the exact presolve: "off" (default — friction
    # builds in the monotone Jacobi polish), "qp", or "pgs".  A config
    # field (not an env var) so it participates in the jit cache key;
    # the GSW_FQP env var is honored once at module import as the
    # process-wide default for experiments (ADVICE r4).
    friction_stage: str = os.environ.get("GSW_FQP", "off")


@dataclasses.dataclass(frozen=True)
class PhysicsScene:
    model: Optional[ArticulationModel]
    actors: ActorTable
    planes: np.ndarray                 # (P, 4) static planes (n, d)
    link_collision_pts: np.ndarray     # (L, Kl, 3) padded link support pts
    link_faces: np.ndarray             # (L, F, 4)
    link_friction: np.ndarray          # (L,)
    la_pairs: np.ndarray               # (n_la, 2) (link_idx, actor_idx)
    aa_pairs: np.ndarray               # (n_aa, 2) (actor_i, actor_j)
    solver: SolverParams = SolverParams()
    kp: np.ndarray = None              # (dof,) PD gains
    kd: np.ndarray = None
    force_limit: np.ndarray = None
    # ManiSkill controllers balance the robot's passive forces every sim
    # step (set_qf(compute_passive_force()) — gravity + coriolis applied
    # as unclipped external qf); without it the kp=1e3 arm sags ~1.5 cm
    # at the TCP, which breaks tight grasps (UMI opening 8 cm vs 6.6 cm
    # can). Mirrors balance_passive_force=True of the reference's PD
    # controller configs (fr3_umi.py:65-138).
    compensate_passive: bool = True
    sim_freq: int = 120
    control_freq: int = 40

    @property
    def substeps(self) -> int:
        return self.sim_freq // self.control_freq

    @property
    def h(self) -> float:
        return 1.0 / self.sim_freq


def contact_row_count(scene: "PhysicsScene") -> int:
    """Static number of candidate contact rows (see _generate_contacts);
    per-pair counts are capped by the contact-patch reduction."""
    A = scene.actors.num
    K = scene.actors.sup_pts.shape[1] if A else 0
    R = min(scene.solver.contact_patch, K) if K else 0
    n = scene.planes.shape[0] * A * R
    n += len(np.asarray(scene.aa_pairs).reshape(-1, 2)) * 2 * R
    n += len(np.asarray(scene.la_pairs).reshape(-1, 2)) * 2 * R
    return n


@struct.dataclass
class WorldState:
    qpos: jnp.ndarray      # (dof,)
    qvel: jnp.ndarray      # (dof,)
    root_pos: jnp.ndarray  # (3,)
    root_quat: jnp.ndarray # (4,)
    a_pos: jnp.ndarray     # (A, 3)
    a_quat: jnp.ndarray    # (A, 4)
    a_lin: jnp.ndarray     # (A, 3)
    a_ang: jnp.ndarray     # (A, 3)
    # diagnostics / queries, refreshed each control step
    la_forces: jnp.ndarray # (n_la, 3) world force of actor on link
    # warm-start state for the contact solver (static row layout):
    # [lam_n, lam_t1, lam_t2, pos_xyz].  The position gates the warm
    # start: patch reduction reshuffles which support points own which
    # rows, and replaying a friction impulse at a relocated point kicks
    # light objects out of grasps (PhysX warm-starts per *matched*
    # contact; proximity is the TPU-friendly stand-in for feature ids).
    contact_lam: jnp.ndarray = None  # (C, 6)
    # per-env actor friction (domain randomization; defaults to the static
    # scene values, real_xarm_env.py:163-183)
    a_friction: jnp.ndarray = None   # (A,)
    # per-env actor geometric scale (DR obj_scale_range): scales collision
    # support points (and the GS render scale via the wrapper). Mass and
    # inertia stay at their nominal values — the DR range is +-5%, where
    # the volumetric mass change is negligible vs. the geometry change.
    a_scale: jnp.ndarray = None      # (A,)


# ---------------------------------------------------------------------- #
# Contact generation
# ---------------------------------------------------------------------- #


def _generate_contacts(scene: PhysicsScene, kin, state: WorldState):
    """All candidate contacts (static count), fully batched: ONE vectorized
    plane test + ONE vmapped hull query over all directed pairs (the
    per-pair python loop emitted ~10 tiny kernels per pair).

    Body ids: links 0..L-1, actors L..L+A-1, -1 static world."""
    L = scene.model.num_links if scene.model is not None else 0
    A = scene.actors.num
    K = scene.actors.sup_pts.shape[1] if A else 0
    sets: List[C.ContactSet] = []

    a_fric = (state.a_friction if state.a_friction is not None
              else jnp.asarray(scene.actors.friction))
    sup = jnp.asarray(scene.actors.sup_pts)
    if state.a_scale is not None:
        sup = sup * state.a_scale[:, None, None]
    a_pts_w = C.transform_points(state.a_pos, state.a_quat, sup)

    # ---- actors vs planes: (P, A, K) in one shot ----
    P = scene.planes.shape[0]
    if P and A:
        planes = jnp.asarray(scene.planes)                 # (P, >=4)
        h = _einsum("akj,pj->pak", a_pts_w, planes[:, :3]) + \
            planes[:, 3, None, None]
        pen = -h                                           # (P, A, K)
        if planes.shape[1] >= 8:
            inside = ((a_pts_w[None, :, :, 0] >= planes[:, 4, None, None])
                      & (a_pts_w[None, :, :, 0] <= planes[:, 5, None, None])
                      & (a_pts_w[None, :, :, 1] >= planes[:, 6, None, None])
                      & (a_pts_w[None, :, :, 1] <= planes[:, 7, None, None]))
            pen = jnp.where(inside, pen, -1.0)
        # patch reduction: deepest + greedy max-spread (C.reduce_patch)
        R = min(scene.solver.contact_patch, K)
        mg = scene.solver.contact_margin
        pts_b = jnp.broadcast_to(a_pts_w[None], (P, A, K, 3))
        pen, top = C.reduce_patch(pen, pts_b, R, margin=mg)  # (P, A, R)
        pos = jnp.take_along_axis(pts_b, top[..., None], axis=2)
        nrm = jnp.broadcast_to(planes[:, None, None, :3], (P, A, R, 3))
        body_a = jnp.broadcast_to(
            (L + jnp.arange(A, dtype=jnp.int32))[None, :, None], (P, A, R))
        fric = jnp.broadcast_to(a_fric[None, :, None], (P, A, R))
        sets.append(C.ContactSet(
            pos=pos.reshape(-1, 3), normal=nrm.reshape(-1, 3),
            pen=pen.reshape(-1), body_a=body_a.reshape(-1),
            body_b=jnp.full((P * A * R,), -1, jnp.int32),
            friction=fric.reshape(-1), active=pen.reshape(-1) > -mg))

    # ---- hull queries: all directed (src pts -> dst hull) pairs at once ----
    aa = np.asarray(scene.aa_pairs).reshape(-1, 2)
    la = np.asarray(scene.la_pairs).reshape(-1, 2)
    q_src_kind, q_src, q_dst_kind, q_dst = [], [], [], []
    q_body_a, q_body_b = [], []
    q_mu_dyn = []   # traced per-query friction
    q_pref = []     # SAT-score penalty (see SolverParams.link_face_pref)
    for (i, j) in aa:
        for (s, d) in ((int(i), int(j)), (int(j), int(i))):
            q_src_kind.append(1); q_src.append(s)
            q_dst_kind.append(1); q_dst.append(d)
            q_body_a.append(L + s); q_body_b.append(L + d)
            q_mu_dyn.append(0.5 * (a_fric[s] + a_fric[d]))
            q_pref.append(0.0)
    la_spans = []
    base = sum(s.pen.shape[0] for s in sets)
    R = min(scene.solver.contact_patch, K) if K else 0
    for (l, a) in la:
        l, a = int(l), int(a)
        mu = 0.5 * (scene.link_friction[l] + a_fric[a])
        start = base + len(q_src) * R
        q_src_kind += [0, 1]; q_src += [l, a]
        q_dst_kind += [1, 0]; q_dst += [a, l]
        q_body_a += [l, L + a]; q_body_b += [L + a, l]
        q_mu_dyn += [mu, mu]
        # penalize the link-pts->actor-hull query (its axis is an actor
        # FACET normal): flat link faces give grasp-stable axes
        q_pref += [scene.solver.link_face_pref, 0.0]
        la_spans.append((start, start + 2 * R))

    if q_src:
        l_pts_w = C.transform_points(
            kin.link_pos, kin.link_quat,
            jnp.asarray(scene.link_collision_pts)) if scene.model is not None \
            else jnp.zeros((1, K, 3))
        sk = np.asarray(q_src_kind)
        src_pts = jnp.where(
            jnp.asarray(sk)[:, None, None] == 1,
            a_pts_w[jnp.asarray(np.where(sk == 1, q_src, 0))],
            l_pts_w[jnp.asarray(np.where(sk == 0, q_src, 0))])
        dk = np.asarray(q_dst_kind)
        dst_pos = jnp.where(
            jnp.asarray(dk)[:, None] == 1,
            state.a_pos[jnp.asarray(np.where(dk == 1, q_dst, 0))],
            kin.link_pos[jnp.asarray(np.where(dk == 0, q_dst, 0))]
            if scene.model is not None else 0.0)
        dst_quat = jnp.where(
            jnp.asarray(dk)[:, None] == 1,
            state.a_quat[jnp.asarray(np.where(dk == 1, q_dst, 0))],
            kin.link_quat[jnp.asarray(np.where(dk == 0, q_dst, 0))]
            if scene.model is not None else 0.0)
        a_faces = jnp.asarray(scene.actors.faces)
        if state.a_scale is not None:
            # scaling a hull scales its face-plane offsets (normals fixed)
            a_faces = a_faces.at[..., 3].multiply(state.a_scale[:, None])
        dst_faces = jnp.where(
            jnp.asarray(dk)[:, None, None] == 1,
            a_faces[jnp.asarray(np.where(dk == 1, q_dst, 0))],
            jnp.asarray(scene.link_faces)[
                jnp.asarray(np.where(dk == 0, q_dst, 0))]
            if scene.model is not None else 0.0)

        mg = scene.solver.contact_margin
        inside, depth, sd, nrm_f = jax.vmap(
            lambda p, dp, dq, df: C.hull_query_sat(p, dp, dq, df, margin=mg)
        )(src_pts, dst_pos, dst_quat, dst_faces)          # (Q, K/F, ...)
        # SAT axis per undirected pair: directed queries are built in
        # adjacent (q, q^1) partner pairs; the pair's contact normal is
        # the minimal-depth face axis across BOTH dst hulls, and only the
        # query owning the winning face emits rows (PhysX-style shared
        # patch normal — per-point facet normals let grasped objects
        # squirt out of the friction cone, see hull_query_sat)
        best_f = jnp.argmin(depth, axis=1)                # (Q,)
        best_d = jnp.min(depth, axis=1)                   # (Q,)
        Q = len(q_src)
        part = jnp.arange(Q, dtype=jnp.int32) ^ 1         # partner query
        overlap = jnp.minimum(best_d, best_d[part]) > -mg
        even = (jnp.arange(Q) % 2) == 0
        score = best_d + jnp.asarray(q_pref, jnp.float32)
        win = jnp.where(even, score <= score[part], score < score[part])
        n_win = jnp.take_along_axis(
            nrm_f, best_f[:, None, None], axis=1)[:, 0]   # (Q, 3)
        pen = -jnp.take_along_axis(
            sd, best_f[:, None, None], axis=2)[..., 0]    # (Q, K)
        ok = inside & (overlap & win)[:, None]
        pen = jnp.where(ok, pen, -1.0)
        nrm = jnp.broadcast_to(n_win[:, None, :], src_pts.shape)
        pos = src_pts
        # patch reduction: deepest + greedy max-spread (C.reduce_patch)
        pen, top = C.reduce_patch(pen, pos, R, margin=mg)  # (Q, R)
        nrm = jnp.take_along_axis(nrm, top[..., None], axis=1)
        pos = jnp.take_along_axis(pos, top[..., None], axis=1)
        sets.append(C.ContactSet(
            pos=pos.reshape(-1, 3), normal=nrm.reshape(-1, 3),
            pen=pen.reshape(-1),
            body_a=jnp.repeat(jnp.asarray(q_body_a, jnp.int32), R),
            body_b=jnp.repeat(jnp.asarray(q_body_b, jnp.int32), R),
            friction=jnp.repeat(jnp.stack(q_mu_dyn), R),
            active=pen.reshape(-1) > -mg))

    if not sets:
        z = jnp.zeros((0,))
        empty = C.ContactSet(pos=jnp.zeros((0, 3)), normal=jnp.zeros((0, 3)),
                             pen=z, body_a=jnp.zeros((0,), jnp.int32),
                             body_b=jnp.zeros((0,), jnp.int32), friction=z,
                             active=jnp.zeros((0,), bool))
        return empty, la_spans
    return C.concat_contacts(sets), la_spans


def _tangent_basis(n):
    """Two unit tangents per normal (C, 3) -> (C, 3), (C, 3)."""
    ref = jnp.where(jnp.abs(n[..., 2:3]) < 0.9,
                    jnp.asarray([0.0, 0.0, 1.0]),
                    jnp.asarray([1.0, 0.0, 0.0]))
    t1 = jnp.cross(n, ref)
    t1 = t1 / jnp.maximum(jnp.linalg.norm(t1, axis=-1, keepdims=True), 1e-9)
    t2 = jnp.cross(n, t1)
    return t1, t2


def _solve_contacts(scene: PhysicsScene, kin, contacts: C.ContactSet,
                    Minv_eff, qvel_free, a_lin_free, a_ang_free, state,
                    anc_mask, lam0=None):
    """Projected-Jacobi contact solve. Returns (qvel, a_lin, a_ang,
    impulses (C, 3dirs))."""
    sp = scene.solver
    h = scene.h
    L = scene.model.num_links if scene.model is not None else 0
    A = scene.actors.num
    nC = contacts.pen.shape[0]
    if nC == 0:
        return qvel_free, a_lin_free, a_ang_free, jnp.zeros((0, 6))
    if lam0 is None:
        lam0 = jnp.zeros((nC, 6))
    # warm-start gating: only replay impulses whose contact point is
    # still (nearly) where it was when the impulse was computed
    matched = (jnp.sum((contacts.pos - lam0[:, 3:6]) ** 2, axis=-1)
               < 0.005 ** 2)
    lam0 = jnp.where(matched[:, None], lam0[:, :3], 0.0)

    n = contacts.normal
    t1, t2 = _tangent_basis(n)
    dirs = jnp.stack([n, t1, t2], axis=1)                 # (C, 3, 3)

    # ---- robot jacobian rows: J[c, d, dof] ----
    if scene.model is not None and scene.model.dof > 0:
        S = kin.S                                         # (dof, 6)
        Sw, Sv = S[:, :3], S[:, 3:]
        # velocity of dof d at point x: Sv_d + Sw_d x x
        vel_at = (Sv[None, :, :]
                  + jnp.cross(Sw[None, :, :],
                              contacts.pos[:, None, :]))  # (C, dof, 3)
        Jfull = _einsum("cij,cdj->cid", dirs, vel_at)     # (C, 3, dof)
        is_link_a = (contacts.body_a >= 0) & (contacts.body_a < L)
        is_link_b = (contacts.body_b >= 0) & (contacts.body_b < L)
        anc_a = anc_mask[jnp.clip(contacts.body_a, 0, L - 1)]  # (C, dof)
        anc_b = anc_mask[jnp.clip(contacts.body_b, 0, L - 1)]
        mask = (jnp.where(is_link_a[:, None], anc_a, 0.0)
                - jnp.where(is_link_b[:, None], anc_b, 0.0))   # (C, dof)
        J_rob = Jfull * mask[:, None, :]                  # (C, 3, dof)
        MinvJt = _einsum("de,cie->cid", Minv_eff, J_rob)  # (C, 3, dof)
        D_rob = jnp.sum(J_rob * MinvJt, axis=-1)          # (C, 3)
    else:
        J_rob = jnp.zeros((nC, 3, 0))
        MinvJt = J_rob
        D_rob = jnp.zeros((nC, 3))

    # ---- actor terms ----
    a_idx_a = contacts.body_a - L                         # (C,) maybe <0
    a_idx_b = contacts.body_b - L
    is_act_a = a_idx_a >= 0
    is_act_b = a_idx_b >= 0
    inv_mass = 1.0 / jnp.asarray(scene.actors.mass)
    # world-frame inverse inertia per actor
    from gsworld_tpu.core.maths import quat_to_matrix
    Rw = quat_to_matrix(state.a_quat)                     # (A, 3, 3)
    Iw = _einsum("aij,ajk,alk->ail", Rw, jnp.asarray(scene.actors.inertia), Rw)
    Iw_inv = jnp.linalg.inv(Iw)                           # (A, 3, 3)

    def lever(idx, is_act):
        com = state.a_pos[jnp.clip(idx, 0, A - 1)]
        r = contacts.pos - com
        return jnp.where(is_act[:, None], r, 0.0)

    r_a = lever(a_idx_a, is_act_a)
    r_b = lever(a_idx_b, is_act_b)
    rxd_a = jnp.cross(r_a[:, None, :], dirs)              # (C, 3, 3)
    rxd_b = jnp.cross(r_b[:, None, :], dirs)
    im_a = jnp.where(is_act_a, inv_mass[jnp.clip(a_idx_a, 0, A - 1)], 0.0)
    im_b = jnp.where(is_act_b, inv_mass[jnp.clip(a_idx_b, 0, A - 1)], 0.0)
    Ii_a = Iw_inv[jnp.clip(a_idx_a, 0, A - 1)] * is_act_a[:, None, None]
    Ii_b = Iw_inv[jnp.clip(a_idx_b, 0, A - 1)] * is_act_b[:, None, None]
    D_act = (im_a[:, None] + im_b[:, None]
             + _einsum("cij,cjk,cik->ci", rxd_a, Ii_a, rxd_a)
             + _einsum("cij,cjk,cik->ci", rxd_b, Ii_b, rxd_b))
    D = jnp.maximum(D_rob + D_act, 1e-9)                  # (C, 3)

    # Baumgarte bias: desired separating normal velocity.  Speculative
    # rows (pen < 0: within contact_margin but not yet touching) get a
    # NEGATIVE bias pen/h — the pair may approach at most the remaining
    # distance this substep, so fast closures stop exactly at the surface
    # instead of tunnelling a vertex deep before activation (PhysX
    # contactOffset semantics).
    b = jnp.where(
        contacts.pen >= 0.0,
        jnp.minimum(sp.baumgarte / h
                    * jnp.maximum(contacts.pen - sp.slop, 0.0),
                    sp.max_pen_vel),
        contacts.pen / h)

    act_mask = contacts.active
    seg_a = jnp.where(is_act_a, a_idx_a, A)               # A = trash row
    seg_b = jnp.where(is_act_b, a_idx_b, A)

    # --- mass splitting: Jacobi diverges when several active rows push the
    # same body (each assumes the others are fixed); divide each row's step
    # by the number of active rows sharing its most-contended body.
    # Robot rows are counted per *link* (links couple through the arm, but
    # per-link counting converges ~5x faster than a global row count and is
    # stabilized by the under-relaxation) ---
    af = act_mask.astype(jnp.float32)
    cnt_act = (jnp.zeros(A + 1).at[seg_a].add(af)
               + jnp.zeros(A + 1).at[seg_b].add(af))       # rows per actor
    if scene.model is not None and scene.model.dof > 0:
        link_a = jnp.where((contacts.body_a >= 0) & (contacts.body_a < L),
                           contacts.body_a, L)
        link_b = jnp.where((contacts.body_b >= 0) & (contacts.body_b < L),
                           contacts.body_b, L)
        cnt_link = (jnp.zeros(L + 1).at[link_a].add(af)
                    + jnp.zeros(L + 1).at[link_b].add(af))
        cnt_link = cnt_link.at[L].set(0.0)
        cnt_rob_row = jnp.maximum(cnt_link[link_a], cnt_link[link_b])
    else:
        cnt_rob_row = jnp.zeros_like(af)
    n_shared = jnp.maximum(jnp.maximum(cnt_act[seg_a], cnt_act[seg_b]),
                           cnt_rob_row)
    split = 1.0 / jnp.maximum(n_shared, 1.0)               # (C,)

    def body_vel(qvel, a_lin, a_ang):
        # relative velocity along each dir: J_rob qvel + actor terms
        v = _einsum("cid,d->ci", J_rob, qvel)
        lin_a = a_lin[jnp.clip(a_idx_a, 0, A - 1)] * is_act_a[:, None]
        ang_a = a_ang[jnp.clip(a_idx_a, 0, A - 1)] * is_act_a[:, None]
        lin_b = a_lin[jnp.clip(a_idx_b, 0, A - 1)] * is_act_b[:, None]
        ang_b = a_ang[jnp.clip(a_idx_b, 0, A - 1)] * is_act_b[:, None]
        va = lin_a + jnp.cross(ang_a, r_a)
        vb = lin_b + jnp.cross(ang_b, r_b)
        v = v + _einsum("cij,cj->ci", dirs, va - vb)
        return v                                          # (C, 3)

    def deltas_from_lam(lam):
        # robot
        dqvel = jnp.sum(_einsum("cid,ci->cd", MinvJt, lam), axis=0)
        # actors: impulse world vectors
        P = _einsum("cij,ci->cj", dirs, lam)              # (C, 3)
        dlin = (jnp.zeros((A + 1, 3)).at[seg_a].add(P * im_a[:, None])
                - jnp.zeros((A + 1, 3)).at[seg_b].add(P * im_b[:, None]))[:A]
        tau_a = jnp.cross(r_a, P)
        tau_b = jnp.cross(r_b, P)
        dang = (jnp.zeros((A + 1, 3)).at[seg_a].add(
                    _einsum("cij,cj->ci", Ii_a, tau_a))
                - jnp.zeros((A + 1, 3)).at[seg_b].add(
                    _einsum("cij,cj->ci", Ii_b, tau_b)))[:A]
        return dqvel, dlin, dang

    def iteration(lam, _):
        dqvel, dlin, dang = deltas_from_lam(lam)
        v = body_vel(qvel_free + dqvel, a_lin_free + dlin, a_ang_free + dang)
        step = sp.relaxation * split
        # normal update
        ln = lam[:, 0] - step * (v[:, 0] - b) / D[:, 0]
        ln = jnp.where(act_mask, jnp.maximum(ln, 0.0), 0.0)
        # friction box clamp
        lim = contacts.friction * ln
        lt1 = jnp.clip(lam[:, 1] - step * v[:, 1] / D[:, 1], -lim, lim)
        lt2 = jnp.clip(lam[:, 2] - step * v[:, 2] / D[:, 2], -lim, lim)
        lt1 = jnp.where(act_mask, lt1, 0.0)
        lt2 = jnp.where(act_mask, lt2, 0.0)
        return jnp.stack([ln, lt1, lt2], axis=1), None

    # warm start: keep impulses only on rows still active this substep
    lam0 = jnp.where(act_mask[:, None], lam0, 0.0)

    # ---- exact normal presolve --------------------------------------- #
    # Matrix-free Jacobi cannot bridge extreme mass ratios: a PD-driven
    # finger (effective inertia ~1 kg through M + h*kd) squeezing a 4 g
    # density-10 DTC can (reference dtc.py:26) forms a heavy-light-heavy
    # sandwich whose force transmission needs O(m_link/m_can) sweeps —
    # the fingers grind through the object long before the impulse
    # builds.  The contact count C is small and static, so build the
    # normal-direction Delassus matrix explicitly and solve the normal
    # LCP with a few active-set Newton steps: batched (C, C) dense
    # solves, which is exactly what the MXU is good at.  The Jacobi loop
    # below then only polishes friction and the normal/friction coupling,
    # both of which are small-impulse corrections.
    n_dir = dirs[:, 0, :]                                 # (C, 3)
    Jn = J_rob[:, 0, :]                                   # (C, dof)
    if scene.model is not None and scene.model.dof > 0:
        An = _einsum("cd,de,fe->cf", Jn, Minv_eff, Jn)
    else:
        An = jnp.zeros((nC, nC))
    if A:
        oh_a = jax.nn.one_hot(seg_a, A + 1)[:, :A]        # (C, A)
        oh_b = jax.nn.one_hot(seg_b, A + 1)[:, :A]
        rxn_a = jnp.cross(r_a, n_dir)
        rxn_b = jnp.cross(r_b, n_dir)
        G_lin = (oh_a[:, :, None] * n_dir[:, None, :]
                 - oh_b[:, :, None] * n_dir[:, None, :])  # (C, A, 3)
        G_ang = (oh_a[:, :, None] * rxn_a[:, None, :]
                 - oh_b[:, :, None] * rxn_b[:, None, :])
        An = An + _einsum("cak,a,dak->cd", G_lin, inv_mass, G_lin)
        An = An + _einsum("cak,akl,dal->cd", G_ang, Iw_inv, G_ang)
    # Tikhonov regularization keeps the masked solve well-posed: rows on
    # a sandwiched body are redundant (rank-deficient An), and shrinking
    # the regularization to restore hard contact makes the f32 solve
    # produce huge near-cancelling impulse pairs (measured: a first-touch
    # squeeze launched a 4 g can at 26 m/s at 1e-5 rel. compliance).  But
    # plain 1e-3 compliance is real softness for light actors (diag ~
    # 300-800 1/kg): the presolved pinch still closed at ~0.1 m/s and
    # fingers ground 17 mm into the can until the SAT axis flipped.  So:
    # solve with the well-conditioned 1e-3 matrix, then remove its
    # compliance bias by iterative refinement against the UNregularized
    # Delassus (error shrinks ~1e-3 per sweep in range-space directions;
    # null-space components stay bounded by the regularized solve).
    An_raw = An
    An = An + 1e-3 * jnp.diag(jnp.diagonal(An)) + 1e-9 * jnp.eye(nC)

    def normal_newton(lam_f, x_init):
        """Semismooth (min-map) Newton on min(x, w) = 0: solve w = 0 on
        the active set, then switch act <- {x > w}.  The earlier rule
        act <- {x>0 or w<0} got STUCK when the unconstrained solve
        returned x < 0 on a row with w < 0: clamping x to 0 kept the row
        active and every subsequent solve reproduced the identical
        solution — on a gripper squeeze the residual closing velocity
        survived "exact" presolves and the fingers ground 2-4 cm into
        the object, deep enough to flip the SAT axis and lose the grasp.

        ``lam_f`` (C, 2): friction impulses folded into the free
        velocity, so normals and friction stagger to a consistent pair.
        """
        lam_nf = jnp.concatenate([jnp.zeros((nC, 1)), lam_f], axis=1)
        dq_t, dl_t, da_t = deltas_from_lam(lam_nf)
        v0n = body_vel(qvel_free + dq_t, a_lin_free + dl_t,
                       a_ang_free + da_t)[:, 0]
        rhs = v0n - b                                     # w = An x + rhs
        x = jnp.maximum(x_init, 0.0)
        act = act_mask & ((x > 0.0) | (rhs < 0.0))
        for _ in range(7):
            m2 = act[:, None] & act[None, :]
            A_m = jnp.where(m2, An, 0.0) + jnp.diag(
                jnp.where(act, 0.0, 1.0))
            A_raw = jnp.where(m2, An_raw, 0.0) + jnp.diag(
                jnp.where(act, 0.0, 1.0))
            rhs_m = jnp.where(act, rhs, 0.0)
            x = jnp.linalg.solve(A_m, -rhs_m)
            for _ in range(2):  # refine away the Tikhonov compliance bias
                x = x - jnp.linalg.solve(A_m, A_raw @ x + rhs_m)
            x = jnp.where(act, x, 0.0)            # unclamped on act
            w = An_raw @ x + rhs
            act = act_mask & (x > w)
        return jnp.maximum(jnp.where(act, x, 0.0), 0.0)

    # ---- exact friction solve ----------------------------------------- #
    # The Jacobi polish alone cannot deliver the precise tangential
    # balance a 4 g object pinched at ~30 N needs: its fixed point
    # depends on the warm start, and when patch reduction reshuffles
    # contact points the transient imbalance kicks the object out at
    # m/s scale (one substep of unbalanced 30 N on 4 g = 75 m/s^2*s).
    # Friction at fixed normal impulses is a box-constrained QP on the
    # tangential Delassus; projected Newton on the free set solves it
    # exactly and warm-start-independently.
    tdir = dirs[:, 1:, :].reshape(2 * nC, 3)
    Jt = J_rob[:, 1:, :].reshape(2 * nC, -1)
    if scene.model is not None and scene.model.dof > 0:
        At = _einsum("cd,de,fe->cf", Jt, Minv_eff, Jt)
    else:
        At = jnp.zeros((2 * nC, 2 * nC))
    if A:
        oh_a2 = jnp.repeat(oh_a, 2, axis=0)               # (2C, A)
        oh_b2 = jnp.repeat(oh_b, 2, axis=0)
        rxt_a = rxd_a[:, 1:, :].reshape(2 * nC, 3)
        rxt_b = rxd_b[:, 1:, :].reshape(2 * nC, 3)
        Gl = (oh_a2[:, :, None] * tdir[:, None, :]
              - oh_b2[:, :, None] * tdir[:, None, :])
        Ga = (oh_a2[:, :, None] * rxt_a[:, None, :]
              - oh_b2[:, :, None] * rxt_b[:, None, :])
        At = At + _einsum("cak,a,dak->cd", Gl, inv_mass, Gl)
        At = At + _einsum("cak,akl,dal->cd", Ga, Iw_inv, Ga)
    At_raw = At
    At = At + 1e-3 * jnp.diag(jnp.diagonal(At)) + 1e-9 * jnp.eye(2 * nC)

    def friction_qp(x_n, y_init):
        """Box QP: min 1/2 y^T At y + y^T r  s.t. |y_i| <= mu_i x_n_i."""
        lim2 = jnp.repeat(contacts.friction * x_n, 2)
        lam_no = jnp.concatenate(
            [x_n[:, None], jnp.zeros((nC, 2))], axis=1)
        dq_t, dl_t, da_t = deltas_from_lam(lam_no)
        r_t = body_vel(qvel_free + dq_t, a_lin_free + dl_t,
                       a_ang_free + da_t)[:, 1:].reshape(2 * nC)
        y = jnp.clip(y_init.reshape(2 * nC), -lim2, lim2)
        okr = jnp.repeat(act_mask, 2) & (lim2 > 0.0)
        for _ in range(3):
            g = At_raw @ y + r_t
            at_hi = y >= lim2 * (1.0 - 1e-5)
            at_lo = y <= -lim2 * (1.0 - 1e-5)
            free = okr & ~((at_hi & (g <= 0.0)) | (at_lo & (g >= 0.0)))
            y_b = jnp.where(free, 0.0, jnp.where(okr, y, 0.0))
            m2 = free[:, None] & free[None, :]
            A_m = jnp.where(m2, At, 0.0) + jnp.diag(
                jnp.where(free, 0.0, 1.0))
            A_raw = jnp.where(m2, At_raw, 0.0) + jnp.diag(
                jnp.where(free, 0.0, 1.0))
            rr = jnp.where(free, r_t + At_raw @ y_b, 0.0)
            yf = jnp.linalg.solve(A_m, -rr)
            yf = yf - jnp.linalg.solve(A_m, A_raw @ yf + rr)
            y = jnp.clip(jnp.where(free, yf, y_b), -lim2, lim2)
        return y.reshape(nC, 2)

    def friction_pgs(x_n, y_init):
        """Box-projected diagonally-preconditioned Jacobi on the exact
        tangential system: monotone for PSD At, never produces the
        clipped-cancellation kicks the active-set solve can."""
        lim2 = jnp.repeat(contacts.friction * x_n, 2)
        lam_no = jnp.concatenate(
            [x_n[:, None], jnp.zeros((nC, 2))], axis=1)
        dq_t, dl_t, da_t = deltas_from_lam(lam_no)
        r_t = body_vel(qvel_free + dq_t, a_lin_free + dl_t,
                       a_ang_free + da_t)[:, 1:].reshape(2 * nC)
        Dt = jnp.maximum(jnp.diagonal(At_raw), 1e-9)
        okr = jnp.repeat(act_mask, 2) & (lim2 > 0.0)
        split2 = jnp.repeat(split, 2)
        y = jnp.where(okr, jnp.clip(y_init.reshape(2 * nC), -lim2, lim2),
                      0.0)
        for _ in range(24):
            g = At_raw @ y + r_t
            y = jnp.clip(y - split2 * g / Dt, -lim2, lim2)
            y = jnp.where(okr, y, 0.0)
        return y.reshape(nC, 2)

    # "off" (default): friction builds in the Jacobi polish, which is
    # monotone under mass splitting and never emits the clipped-
    # cancellation kicks the exact stages can; the measured grasp
    # contracts (test_xarm_agent.py) hold with the polish alone.  The
    # exact stages stay available for experiments (SolverParams
    # .friction_stage; GSW_FQP sets the process default at import).
    _fqp = sp.friction_stage
    x = normal_newton(lam0[:, 1:], lam0[:, 0])
    if _fqp == "qp":
        y = friction_qp(x, lam0[:, 1:])
        x = normal_newton(y, x)
    elif _fqp == "pgs":
        y = friction_pgs(x, lam0[:, 1:])
        x = normal_newton(y, x)
    else:  # "off": friction handled by the polish alone (r3 behavior)
        y = lam0[:, 1:]
    lam_ps = jnp.concatenate([x[:, None], y], axis=1)

    # ---- kick safety valve -------------------------------------------- #
    # The exact presolve can return huge near-cancelling impulse sets on
    # ill-conditioned active sets (near-parallel opposing rows on a light
    # body the instant a SAT axis flips); their residual arrives as an
    # m/s-scale kick.  Physical substep deltas are bounded by the free
    # velocity plus the bias budget, so any actor whose presolve delta
    # exceeds that falls back to the gated warm start and lets the
    # monotone polish carry the substep (PhysX ships the same guard as
    # maxDepenetrationVelocity / maxContactImpulse).
    if A:
        _, dlin_ps, dang_ps = deltas_from_lam(lam_ps)
        bad_a = ((jnp.linalg.norm(dlin_ps, axis=-1)
                  > jnp.linalg.norm(a_lin_free, axis=-1) + sp.max_kick_lin)
                 | (jnp.linalg.norm(dang_ps, axis=-1)
                    > jnp.linalg.norm(a_ang_free, axis=-1)
                    + sp.max_kick_ang))
        bad_pad = jnp.concatenate([bad_a, jnp.zeros((1,), bool)])
        row_bad = bad_pad[seg_a] | bad_pad[seg_b]
        lam_ps = jnp.where(row_bad[:, None], lam0, lam_ps)

    lam, _ = jax.lax.scan(iteration, lam_ps, None, length=sp.iterations)
    dqvel, dlin, dang = deltas_from_lam(lam)
    lam_state = jnp.concatenate([lam, contacts.pos], axis=1)
    return (qvel_free + dqvel, a_lin_free + dlin, a_ang_free + dang,
            lam_state)


# ---------------------------------------------------------------------- #
# Stepping
# ---------------------------------------------------------------------- #


def physics_substep(scene: PhysicsScene, state: WorldState, q_target,
                    anc_mask):
    model = scene.model
    h = scene.h
    kin = D.compute_kinematics(model, state.qpos, state.root_pos,
                               state.root_quat)
    M = D.mass_matrix(model, kin)
    bias = D.bias_forces(model, kin, state.qvel)
    # passive-force balancing: the compensation torque (= bias at the
    # current state) enters as unclipped external qf, exactly cancelling
    # gravity+coriolis in the free solve (SAPIEN set_qf semantics)
    comp = bias if scene.compensate_passive else None
    qvel_free, Minv_eff = D.implicit_pd_velocity(
        model, M, bias, state.qpos, state.qvel, q_target,
        jnp.asarray(scene.kp), jnp.asarray(scene.kd),
        jnp.asarray(scene.force_limit), h, tau_external=comp)

    a_lin_free = state.a_lin + h * D.GRAVITY
    a_ang_free = state.a_ang

    contacts, la_spans = _generate_contacts(scene, kin, state)
    qvel, a_lin, a_ang, lam = _solve_contacts(
        scene, kin, contacts, Minv_eff, qvel_free, a_lin_free, a_ang_free,
        state, anc_mask, lam0=state.contact_lam)

    # per-(link, actor) pair contact force (world) on the link
    n_la = len(np.asarray(scene.la_pairs).reshape(-1, 2))
    if n_la and contacts.pen.shape[0]:
        n_dirs = contacts.normal
        t1, t2 = _tangent_basis(n_dirs)
        P = (n_dirs * lam[:, 0:1] + t1 * lam[:, 1:2] + t2 * lam[:, 2:3]) / h
        L = model.num_links
        forces = []
        for pi, (l, a) in enumerate(np.asarray(scene.la_pairs).reshape(-1, 2)):
            sel_a = (contacts.body_a == int(l)) & (contacts.body_b == L + int(a))
            sel_b = (contacts.body_a == L + int(a)) & (contacts.body_b == int(l))
            f = (jnp.sum(jnp.where(sel_a[:, None], P, 0.0), axis=0)
                 - jnp.sum(jnp.where(sel_b[:, None], P, 0.0), axis=0))
            forces.append(f)
        la_forces = jnp.stack(forces)
    else:
        la_forces = jnp.zeros((max(n_la, 1), 3))

    # limits + integration (articulation)
    vmax = jnp.asarray(model.velocity)
    qvel = jnp.clip(qvel, -vmax, vmax)
    qpos = state.qpos + h * qvel
    lo = jnp.asarray(model.qlimits[:, 0])
    hi = jnp.asarray(model.qlimits[:, 1])
    qpos = jnp.clip(qpos, lo, hi)
    qvel = jnp.where((qpos <= lo) & (qvel < 0), 0.0, qvel)
    qvel = jnp.where((qpos >= hi) & (qvel > 0), 0.0, qvel)
    qpos, qvel = D.slave_mimics(model, qpos, qvel)

    # actors
    a_pos = state.a_pos + h * a_lin
    wq = jnp.concatenate([jnp.zeros_like(a_ang[:, :1]), a_ang], axis=1)
    a_quat = quat_normalize(state.a_quat + 0.5 * h *
                            quat_multiply(wq, state.a_quat))

    return WorldState(qpos=qpos, qvel=qvel, root_pos=state.root_pos,
                      root_quat=state.root_quat, a_pos=a_pos, a_quat=a_quat,
                      a_lin=a_lin, a_ang=a_ang, la_forces=la_forces,
                      contact_lam=lam, a_friction=state.a_friction,
                      a_scale=state.a_scale)


def control_step(scene: PhysicsScene, state: WorldState,
                 q_target) -> WorldState:
    """One control step = substeps at sim_freq with a fixed PD target
    (the reference's controller.set_drive_targets -> N physx substeps).

    Pair contact forces are averaged over the substeps: instantaneous
    per-substep impulses carry the Baumgarte/PD limit-cycle ripple, while
    the substep mean matches the steady force PhysX queries report
    (is_grasping thresholds at 0.5 N, fr3_umi.py:160-165)."""
    anc_mask = jnp.asarray(D._ancestor_dofs(scene.model), jnp.float32)

    def sub(s, _):
        s2 = physics_substep(scene, s, q_target, anc_mask)
        return s2, s2.la_forces

    state, la_hist = jax.lax.scan(sub, state, None, length=scene.substeps)
    return state.replace(la_forces=jnp.mean(la_hist, axis=0))
