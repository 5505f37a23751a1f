"""Joint-space PD controllers (action -> PD drive targets).

Mirrors the ManiSkill controller surface the reference robots configure
(fr3_umi.py:65-138): ``pd_joint_pos``, ``pd_joint_delta_pos`` and the mimic
gripper controller.  A controller maps a (possibly normalized) action to
per-dof PD position targets; the PD gains themselves live in the physics
scene (world.py).

EE-space controllers (pd_ee_delta_pos/pose) are built on damped-least-squares
IK over the FK Jacobian (see ik.py) and registered by the agents.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from gsworld_tpu.physics.kinematics import ArticulationModel


@dataclasses.dataclass(frozen=True)
class JointGroupConfig:
    """One controlled joint group (arm or gripper)."""

    dof_ids: Tuple[int, ...]       # indices into the articulation qpos
    lower: Optional[float]         # action bound (None: joint limits)
    upper: Optional[float]
    use_delta: bool = False
    normalize_action: bool = True
    mimic: bool = False            # single action replicated to all dofs
    stiffness: float = 1e3
    damping: float = 1e2
    force_limit: float = 100.0

    @property
    def action_dim(self) -> int:
        return 1 if self.mimic else len(self.dof_ids)


@dataclasses.dataclass(frozen=True)
class EEGroupConfig:
    """End-effector delta controller (pd_ee_delta_pos / pd_ee_delta_pose):
    normalized deltas on the TCP pose, resolved to arm joint targets by
    damped-least-squares IK over the FK Jacobian (fr3_umi.py:89-111)."""

    dof_ids: Tuple[int, ...]          # arm dofs the IK solves over
    ee_link: str
    use_rotation: bool = False        # False: pos-only (3 actions)
    pos_lower: float = -0.1
    pos_upper: float = 0.1
    rot_lower: float = -0.1
    rot_upper: float = 0.1
    stiffness: float = 1e3
    damping: float = 1e2
    force_limit: float = 100.0
    ik_iters: int = 12

    @property
    def action_dim(self) -> int:
        return 6 if self.use_rotation else 3


@dataclasses.dataclass(frozen=True)
class CompositeController:
    """Ordered joint groups; actions are concatenated group actions
    (ManiSkill's dict-controller flattening)."""

    groups: Tuple                      # JointGroupConfig | EEGroupConfig
    model: ArticulationModel

    @property
    def action_dim(self) -> int:
        return sum(g.action_dim for g in self.groups)

    def gains(self):
        """(kp, kd, force_limit) arrays over the full dof vector."""
        nd = self.model.dof
        kp = np.zeros(nd, np.float32)
        kd = np.zeros(nd, np.float32)
        fl = np.zeros(nd, np.float32)
        for g in self.groups:
            for d in g.dof_ids:
                kp[d], kd[d], fl[d] = g.stiffness, g.damping, g.force_limit
        return kp, kd, fl

    def compute_targets(self, qpos, prev_target, action,
                        root_pos=None, root_quat=None):
        """Map an action (..., action_dim) to PD targets (..., dof).

        Uncontrolled dofs hold their previous target (mimic dofs are slaved
        in the dynamics layer anyway).
        """
        target = prev_target
        ofs = 0
        lo_j = jnp.asarray(self.model.qlimits[:, 0])
        hi_j = jnp.asarray(self.model.qlimits[:, 1])
        for g in self.groups:
            a = action[..., ofs:ofs + g.action_dim]
            ofs += g.action_dim
            if isinstance(g, EEGroupConfig):
                target = self._ee_targets(g, qpos, target, a,
                                          root_pos, root_quat)
                continue
            if g.mimic:
                a = jnp.repeat(a, len(g.dof_ids), axis=-1)
            ids = jnp.asarray(g.dof_ids)
            if g.use_delta:
                lo = jnp.float32(g.lower if g.lower is not None else -0.1)
                hi = jnp.float32(g.upper if g.upper is not None else 0.1)
                if g.normalize_action:
                    # clip_and_scale_action: ManiSkill clips to [-1, 1]
                    # BEFORE rescaling (ADVICE r1)
                    a = lo + (jnp.clip(a, -1.0, 1.0) + 1.0) * 0.5 * (hi - lo)
                else:
                    a = jnp.clip(a, lo, hi)
                new = qpos[..., ids] + a
            else:
                lo = (jnp.float32(g.lower) if g.lower is not None
                      else lo_j[ids])
                hi = (jnp.float32(g.upper) if g.upper is not None
                      else hi_j[ids])
                if g.normalize_action:
                    a = lo + (jnp.clip(a, -1.0, 1.0) + 1.0) * 0.5 * (hi - lo)
                new = jnp.clip(a, lo, hi)
            new = jnp.clip(new, lo_j[ids], hi_j[ids])
            target = target.at[..., ids].set(new)
        return target

    def _ee_targets(self, g: "EEGroupConfig", qpos, target, a,
                    root_pos, root_quat):
        from gsworld_tpu.core.maths import axis_angle_to_quat, quat_multiply
        from gsworld_tpu.physics.ik import ee_pose_fn, solve_ik

        fk = ee_pose_fn(self.model, g.ee_link)
        p_now, q_now = fk(qpos, root_pos, root_quat)
        a = jnp.clip(a, -1.0, 1.0)  # clip_and_scale_action (ADVICE r1)
        dp = (g.pos_lower + (a[..., :3] + 1.0) * 0.5
              * (g.pos_upper - g.pos_lower))
        p_t = p_now + dp
        if g.use_rotation:
            drot = (g.rot_lower + (a[..., 3:6] + 1.0) * 0.5
                    * (g.rot_upper - g.rot_lower))
            q_t = quat_multiply(axis_angle_to_quat(drot), q_now)
        else:
            q_t = q_now
        q_sol, _ = solve_ik(self.model, g.ee_link, p_t, q_t, qpos,
                            g.dof_ids, root_pos=root_pos,
                            root_quat=root_quat, iters=g.ik_iters)
        ids = jnp.asarray(g.dof_ids)
        return target.at[..., ids].set(q_sol[..., ids])
