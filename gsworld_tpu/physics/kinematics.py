"""Articulated kinematics: static tree description + batched FK.

TPU-native replacement for the FK the reference reads back from SAPIEN
(``link.pose`` at gs_world_wrapper.py:115-116): the kinematic tree is
compiled to static per-link arrays and forward kinematics is an unrolled
chain of quaternion pose compositions — pure jnp, vmappable over envs, fully
fused by XLA inside the step program.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from gsworld_tpu.core.maths import (
    axis_angle_to_quat,
    pose_multiply,
    quat_rotate,
)
from gsworld_tpu.physics.urdf import (
    JOINT_FIXED,
    JOINT_PRISMATIC,
    JOINT_REVOLUTE,
    RobotSpec,
)


def _np_mat_to_quat(R: np.ndarray) -> np.ndarray:
    """Robust numpy rotation-matrix -> wxyz quaternion (host-side only)."""
    tr = R[0, 0] + R[1, 1] + R[2, 2]
    if tr > 0:
        s = np.sqrt(tr + 1.0) * 2
        q = np.array([0.25 * s, (R[2, 1] - R[1, 2]) / s,
                      (R[0, 2] - R[2, 0]) / s, (R[1, 0] - R[0, 1]) / s])
    elif R[0, 0] > R[1, 1] and R[0, 0] > R[2, 2]:
        s = np.sqrt(1.0 + R[0, 0] - R[1, 1] - R[2, 2]) * 2
        q = np.array([(R[2, 1] - R[1, 2]) / s, 0.25 * s,
                      (R[0, 1] + R[1, 0]) / s, (R[0, 2] + R[2, 0]) / s])
    elif R[1, 1] > R[2, 2]:
        s = np.sqrt(1.0 + R[1, 1] - R[0, 0] - R[2, 2]) * 2
        q = np.array([(R[0, 2] - R[2, 0]) / s, (R[0, 1] + R[1, 0]) / s,
                      0.25 * s, (R[1, 2] + R[2, 1]) / s])
    else:
        s = np.sqrt(1.0 + R[2, 2] - R[0, 0] - R[1, 1]) * 2
        q = np.array([(R[1, 0] - R[0, 1]) / s, (R[0, 2] + R[2, 0]) / s,
                      (R[1, 2] + R[2, 1]) / s, 0.25 * s])
    q = q / np.linalg.norm(q)
    return q if q[0] >= 0 else -q


@dataclasses.dataclass(frozen=True)
class ArticulationModel:
    """Static (host-side numpy) articulation description in topological order.

    Index 0 is the root link. ``parent[i] < i`` for all i > 0.  qpos follows
    URDF document order of movable joints — the same order SAPIEN exposes, so
    the qpos tables in constants.py apply verbatim.
    """

    name: str
    link_names: Tuple[str, ...]
    parent: np.ndarray           # (L,) int32, -1 for root
    jtype: np.ndarray            # (L,) int32 joint type connecting link to parent
    origin_pos: np.ndarray       # (L, 3) f32
    origin_quat: np.ndarray      # (L, 4) f32 wxyz
    axis: np.ndarray             # (L, 3) f32
    dof_index: np.ndarray        # (L,) int32, -1 for fixed joints
    dof_names: Tuple[str, ...]   # movable joint names, qpos order
    dof_link: np.ndarray         # (dof,) int32 link index driven by each dof
    qlimits: np.ndarray          # (dof, 2)
    effort: np.ndarray           # (dof,)
    velocity: np.ndarray         # (dof,)
    damping: np.ndarray          # (dof,)
    friction: np.ndarray         # (dof,)
    mimic_parent: np.ndarray     # (dof,) int32 index into dof, -1 = free
    mimic_mult: np.ndarray       # (dof,)
    mimic_offset: np.ndarray     # (dof,)
    mass: np.ndarray             # (L,)
    com_pos: np.ndarray          # (L, 3)
    inertia: np.ndarray          # (L, 3, 3) about COM in link frame

    @property
    def num_links(self) -> int:
        return len(self.link_names)

    @property
    def dof(self) -> int:
        return len(self.dof_names)

    def link_id(self, name: str) -> int:
        return self.link_names.index(name)


def build_articulation(spec: RobotSpec) -> ArticulationModel:
    """Compile a RobotSpec into an ArticulationModel (topo-sorted)."""
    child2joint = {j.child: j for j in spec.joints}
    children: Dict[str, list] = {}
    for j in spec.joints:
        children.setdefault(j.parent, []).append(j.child)
    all_children = set(child2joint)
    roots = [l.name for l in spec.links if l.name not in all_children]
    if len(roots) != 1:
        raise ValueError(f"expected one root link, got {roots}")

    # topo order via DFS following URDF child order
    order = []
    stack = [roots[0]]
    while stack:
        ln = stack.pop(0)
        order.append(ln)
        stack = children.get(ln, []) + stack
    index = {n: i for i, n in enumerate(order)}
    link_by_name = {l.name: l for l in spec.links}

    # dof order = document order of movable joints (SAPIEN parity)
    movable = [j for j in spec.joints if j.jtype != JOINT_FIXED]
    dof_names = tuple(j.name for j in movable)
    dof_of_joint = {n: i for i, n in enumerate(dof_names)}

    L = len(order)
    parent = np.full(L, -1, np.int32)
    jtype = np.zeros(L, np.int32)
    origin_pos = np.zeros((L, 3), np.float32)
    origin_quat = np.tile(np.array([1, 0, 0, 0], np.float32), (L, 1))
    axis = np.tile(np.array([1, 0, 0], np.float32), (L, 1))
    dof_index = np.full(L, -1, np.int32)
    mass = np.zeros(L, np.float32)
    com_pos = np.zeros((L, 3), np.float32)
    inertia = np.zeros((L, 3, 3), np.float32)

    for i, ln in enumerate(order):
        link = link_by_name[ln]
        mass[i] = link.mass
        com_pos[i] = link.com_pos
        # rotate inertia into the link frame: I_link = R I R^T
        inertia[i] = link.com_rot @ link.inertia @ link.com_rot.T
        j = child2joint.get(ln)
        if j is None:
            continue
        parent[i] = index[j.parent]
        jtype[i] = j.jtype
        origin_pos[i] = j.origin_pos
        origin_quat[i] = _np_mat_to_quat(j.origin_rot)
        axis[i] = j.axis
        if j.jtype != JOINT_FIXED:
            dof_index[i] = dof_of_joint[j.name]

    nd = len(movable)
    qlimits = np.zeros((nd, 2), np.float32)
    effort = np.zeros(nd, np.float32)
    velocity = np.zeros(nd, np.float32)
    damping = np.zeros(nd, np.float32)
    friction = np.zeros(nd, np.float32)
    mimic_parent = np.full(nd, -1, np.int32)
    mimic_mult = np.ones(nd, np.float32)
    mimic_offset = np.zeros(nd, np.float32)
    dof_link = np.zeros(nd, np.int32)
    for k, j in enumerate(movable):
        qlimits[k] = [j.limit_lower, j.limit_upper]
        effort[k] = j.effort if np.isfinite(j.effort) else 1e9
        velocity[k] = j.velocity if np.isfinite(j.velocity) else 1e9
        damping[k] = j.damping
        friction[k] = j.friction
        dof_link[k] = index[j.child]
        if j.mimic is not None:
            mimic_parent[k] = dof_of_joint[j.mimic.joint]
            mimic_mult[k] = j.mimic.multiplier
            mimic_offset[k] = j.mimic.offset

    # verify topological ordering
    assert all(parent[i] < i for i in range(1, L)), "tree not topologically sorted"

    return ArticulationModel(
        name=spec.name, link_names=tuple(order), parent=parent, jtype=jtype,
        origin_pos=origin_pos, origin_quat=origin_quat, axis=axis,
        dof_index=dof_index, dof_names=dof_names, dof_link=dof_link,
        qlimits=qlimits, effort=effort, velocity=velocity, damping=damping,
        friction=friction, mimic_parent=mimic_parent, mimic_mult=mimic_mult,
        mimic_offset=mimic_offset, mass=mass, com_pos=com_pos, inertia=inertia,
    )


def joint_local_pose(model: ArticulationModel, i: int, qpos):
    """Pose of link i relative to its parent, given the full qpos vector.
    Static python index i; traced qpos."""
    op = jnp.asarray(model.origin_pos[i])
    oq = jnp.asarray(model.origin_quat[i])
    jt = int(model.jtype[i])
    di = int(model.dof_index[i])
    if jt == JOINT_FIXED or di < 0:
        return op, oq
    q = qpos[..., di]
    ax = jnp.asarray(model.axis[i])
    if jt == JOINT_REVOLUTE:
        jq = axis_angle_to_quat(ax * q[..., None])
        return jnp.broadcast_to(op, q.shape + (3,)), quat_multiply_static(oq, jq)
    # prismatic
    disp = ax * q[..., None]
    return op + quat_rotate(oq, disp), jnp.broadcast_to(oq, q.shape + (4,))


def quat_multiply_static(a, b):
    from gsworld_tpu.core.maths import quat_multiply
    return quat_multiply(a, b)


def forward_kinematics(model: ArticulationModel, qpos,
                       root_pos=None, root_quat=None):
    """Batched FK.

    Args:
      qpos: (..., dof)
      root_pos/root_quat: optional (..., 3)/(..., 4) world pose of the root.

    Returns (link_pos (..., L, 3), link_quat (..., L, 4)).
    """
    batch = qpos.shape[:-1]
    if root_pos is None:
        root_pos = jnp.zeros(batch + (3,), qpos.dtype)
    if root_quat is None:
        root_quat = jnp.broadcast_to(
            jnp.asarray([1.0, 0, 0, 0], qpos.dtype), batch + (4,))

    pos = [None] * model.num_links
    quat = [None] * model.num_links
    pos[0] = jnp.broadcast_to(root_pos, batch + (3,))
    quat[0] = jnp.broadcast_to(root_quat, batch + (4,))
    for i in range(1, model.num_links):
        p_local, q_local = joint_local_pose(model, i, qpos)
        pi = int(model.parent[i])
        pos[i], quat[i] = pose_multiply(pos[pi], quat[pi], p_local, q_local)
        pos[i] = jnp.broadcast_to(pos[i], batch + (3,))
        quat[i] = jnp.broadcast_to(quat[i], batch + (4,))
    return jnp.stack(pos, axis=-2), jnp.stack(quat, axis=-2)


def apply_mimic(model: ArticulationModel, qpos):
    """Overwrite mimic dofs from their parents: q_m = mult * q_p + offset
    (SAPIEN mimic semantics; xarm gripper linkage uses this heavily,
    xarm6_uf_gripper.py:251-345)."""
    mp = jnp.asarray(model.mimic_parent)
    mult = jnp.asarray(model.mimic_mult)
    off = jnp.asarray(model.mimic_offset)
    parent_q = qpos[..., jnp.maximum(mp, 0)]
    return jnp.where(mp >= 0, mult * parent_q + off, qpos)
