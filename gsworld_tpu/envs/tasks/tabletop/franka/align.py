"""AlignFr3Env-v1: place both DTC cans into the spice-rack goal box.

Parity port of gsworld/mani_skill/envs/tasks/tabletop/franka/align.py:27-302:
two cans (green parmesan container + red tomato can) spawn with randomized
tabletop poses; success = both cans' xy within the goal box footprint, not
grasped, and everything static (evaluate: align.py:189-239).  Episode init
replicates the sampling ranges at align.py:136-170 (rejection resampling
bounded); dense reward replicates align.py:257-302.

Collision geometry note: the reference loads DTC convex meshes (external
assets); here the cans are convex cylinders with the DTC frame convention
(body +y = can axis) so the reference's init quaternions apply verbatim.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from gsworld_tpu import constants
from gsworld_tpu.core.maths import axis_angle_to_quat, quat_multiply
from gsworld_tpu.envs.base import EpisodeInit
from gsworld_tpu.envs.registry import register_env
from gsworld_tpu.envs.tasks.real_fr3 import RealFr3
from gsworld_tpu.physics import builders as B

# goal box half sizes (align.py:99-105)
GOAL_HALF = np.array([0.0725 * 2.54 * 0.5, 0.11625 * 2.54 * 0.5,
                      0.05375 * 2.54 * 0.5], np.float32)


@register_env("AlignFr3Env-v1", max_episode_steps=100)
class AlignFr3Env(RealFr3):
    SUPPORTED_ROBOTS = ("fr3_umi", "fr3_umi_wrist435")
    goal_thresh = 0.025

    def __init__(self, *args, robot_uids="fr3_umi",
                 robot_init_qpos_noise=0.02, num_envs=1, **kwargs):
        self.x_offset = 0.615
        self.goal_height = 0.068
        super().__init__(*args, robot_uids=robot_uids, num_envs=num_envs,
                         robot_init_qpos_noise=robot_init_qpos_noise,
                         **kwargs)

    def _load_scene(self):
        # DTC cans approximated as y-axis cylinders (DTC mesh frame), so the
        # reference init quats (x +90deg -> upright) hold
        self._actor_defs = [
            B.cylinder_actor("dtc_green_can_fr3", radius=0.033,
                             half_length=0.065, axis="y", friction=0.6),
            B.cylinder_actor("dtc_red_tomato_can_fr3", radius=0.037,
                             half_length=0.05, axis="y", friction=0.6),
            B.box_actor("spice_rack", GOAL_HALF, friction=0.6),
        ]
        # upright (cylinder axis vertical) resting half-height = half_length
        self._green_h = 0.065
        self._red_h = 0.05

    def _initialize_episode(self, key) -> EpisodeInit:
        ks = jax.random.split(key, 8)
        # rotate fixes (align.py:123-133)
        green_fix = quat_multiply(
            axis_angle_to_quat(jnp.asarray([0.0, 0.0, jnp.pi / 4])),
            axis_angle_to_quat(jnp.asarray([jnp.pi / 2, 0.0, 0.0])))
        red_fix = green_fix
        rack_q = axis_angle_to_quat(jnp.asarray([0.0, 0.0, -jnp.pi / 2]))

        xo = self.x_offset
        obj0 = jnp.stack([
            -0.2 + jax.random.uniform(ks[0]) * 0.05 + xo,
            0.1 + jax.random.uniform(ks[1]) * 0.1,
            self._green_h,
        ])
        goal = jnp.stack([
            jax.random.uniform(ks[2]) * 0.2 - 0.25 + xo,
            jax.random.uniform(ks[3]) * 0.1 - 0.2,
            self.goal_height,
        ])

        # obj1 with bounded rejection resampling (align.py:154-157)
        def sample_obj1(k):
            k1, k2 = jax.random.split(k)
            return jnp.stack([
                jax.random.uniform(k1) * 0.2 - 0.25 + xo,
                jax.random.uniform(k2) * 0.1 + 0.1,
                self._red_h,
            ])

        def cond(carry):
            i, k, p = carry
            bad = ((jnp.linalg.norm(obj0 - p) < 0.1)
                   | (jnp.linalg.norm(obj0 - goal) < 0.15))
            return bad & (i < 16)

        def body(carry):
            i, k, _ = carry
            k, sub = jax.random.split(k)
            return (i + 1, k, sample_obj1(sub))

        first = jnp.stack([
            obj0[0] + jax.random.uniform(ks[4]) * 0.05 + 0.1,
            jax.random.uniform(ks[5]) * 0.1 + 0.1,
            self._red_h,
        ])
        _, _, obj1 = jax.lax.while_loop(cond, body, (0, ks[6], first))

        a_pos = jnp.stack([obj0, obj1, goal])
        a_quat = jnp.stack([green_fix, red_fix, rack_q])
        qpos = jnp.asarray(constants.fr3_umi_task_init_qpos)
        return EpisodeInit(qpos=qpos, a_pos=a_pos, a_quat=a_quat, task={})

    def evaluate(self, data):
        p0, _ = self.actor_pose(data, "dtc_green_can_fr3")
        p1, _ = self.actor_pose(data, "dtc_red_tomato_can_fr3")
        pg, _ = self.actor_pose(data, "spice_rack")
        half_xy_goal = float(GOAL_HALF[:2].max())
        is_xy0 = jnp.linalg.norm(p0[:2] - pg[:2]) <= half_xy_goal - 0.02
        is_xy1 = jnp.linalg.norm(p1[:2] - pg[:2]) <= half_xy_goal - 0.02
        in_box = is_xy0 & is_xy1
        g0 = self.is_grasping(data, "dtc_green_can_fr3")
        g1 = self.is_grasping(data, "dtc_red_tomato_can_fr3")
        grasped = g0 & g1
        robot_static = self.agent_is_static(data, 0.2)
        obj_static = (self.actor_is_static(data, "dtc_green_can_fr3")
                      & self.actor_is_static(data, "dtc_red_tomato_can_fr3"))
        success = in_box & (~grasped) & obj_static
        return {
            "is_grasped_0": g0, "is_grasped_1": g1,
            "is_obj0_in_box": is_xy0, "is_obj1_in_box": is_xy1,
            "is_obj_in_box": in_box,
            "is_robot_static": robot_static, "is_obj_static": obj_static,
            "success": success,
        }

    def _get_obs_extra(self, data, info):
        tcp_p, tcp_q = self.tcp_pose(data)
        pg, _ = self.actor_pose(data, "spice_rack")
        obs = dict(
            tcp_pose=jnp.concatenate([tcp_p, tcp_q]),
            goal_pos=pg,
            is_grasped_0=info["is_grasped_0"],
            is_grasped_1=info["is_grasped_1"],
        )
        if "state" in self.obs_mode:
            p0, q0 = self.actor_pose(data, "dtc_green_can_fr3")
            obs.update(
                tcp_to_goal_pos=pg - tcp_p,
                obj_pose=jnp.concatenate([p0, q0]),
                tcp_to_obj_pos=p0 - tcp_p,
                obj_to_goal_pos=pg - p0,
            )
        return obs

    def compute_dense_reward(self, data, action, info):
        # align.py:257-302 ("self.obj" there is the green can)
        tcp_p, _ = self.tcp_pose(data)
        p0, _ = self.actor_pose(data, "dtc_green_can_fr3")
        pg, _ = self.actor_pose(data, "spice_rack")
        reward = 1.0 - jnp.tanh(5.0 * jnp.linalg.norm(p0 - tcp_p))
        grasped = info["is_grasped_0"] & info["is_grasped_1"]
        reward = reward + 1.0 * grasped
        transport = 1.0 - jnp.tanh(5.0 * jnp.linalg.norm(pg - p0))
        reward = reward + transport * grasped
        in_box = info["is_obj_in_box"]
        reward = reward + 1.0 * in_box
        reward = reward + 1.0 * (in_box & ~grasped)
        reward = reward + 1.0 * (in_box & info["is_obj_static"]
                                 & info["is_robot_static"])
        return jnp.where(info["success"], 6.0, reward)

    def compute_normalized_dense_reward(self, data, action, info):
        return self.compute_dense_reward(data, action, info) / 6.0
