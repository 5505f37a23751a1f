"""AlignXArmEnv-v1: push/place the DTC green can next to the tomato soup can.

Parity port of tabletop/xarm6/align.py:27-260: goal marker box (visual),
tomato-can goal site actor, green DTC can; init sampling with position swap
(:126-187); success = obj xy within the tomato can footprint (no margin),
not grasped, everything static (:189-232).  Robot root at z=+0.03 (:183)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from gsworld_tpu import constants
from gsworld_tpu.core.maths import axis_angle_to_quat, quat_multiply
from gsworld_tpu.envs.base import EpisodeInit
from gsworld_tpu.envs.registry import register_env
from gsworld_tpu.envs.tasks.real_xarm import RealXArm6
from gsworld_tpu.physics import builders as B

YCB_CAN_RADIUS = 0.033


@register_env("AlignXArmEnv-v1", max_episode_steps=100)
class AlignXArmEnv(RealXArm6):
    SUPPORTED_ROBOTS = ("xarm6_uf_gripper", "xarm6_uf_gripper_wrist435")
    goal_thresh = 0.025

    def __init__(self, *args, robot_uids="xarm6_uf_gripper",
                 robot_init_qpos_noise=0.02, num_envs=1, **kwargs):
        self.x_offset = 0.615
        self.goal_height = 0.051
        self.obj_height = 0.05
        super().__init__(*args, robot_uids=robot_uids, num_envs=num_envs,
                         robot_init_qpos_noise=robot_init_qpos_noise,
                         **kwargs)

    def _load_scene(self):
        self._actor_defs = [
            B.cylinder_actor("dtc_green_can", radius=0.033, half_length=0.065,
                             axis="y", friction=0.6),
            B.cylinder_actor("005_tomato_soup_can", radius=YCB_CAN_RADIUS,
                             half_length=0.051, axis="z", friction=0.6),
        ]
        self.obj_name = "dtc_green_can"
        self.goal_name = "005_tomato_soup_can"

    def _root_pose(self):
        return jnp.asarray([self.x_offset - 0.615, 0.0, 0.03])

    def _single_reset(self, key):
        world, run_key, q0, task = super()._single_reset(key)
        world = world.replace(root_pos=self._root_pose())
        return world, run_key, q0, task

    def _initialize_episode(self, key) -> EpisodeInit:
        ks = jax.random.split(key, 8)
        xo = self.x_offset
        can_fix = quat_multiply(
            axis_angle_to_quat(jnp.asarray([0.0, 0.0, jnp.pi / 4])),
            axis_angle_to_quat(jnp.asarray([jnp.pi / 2, 0.0, 0.0])))
        obj = jnp.stack([
            -0.125 + jax.random.uniform(ks[0]) * 0.125 + xo
            + jax.random.uniform(ks[1]) * 0.05 - 0.025,
            0.1 + jax.random.uniform(ks[2]) * 0.1 + 0.15
            + jax.random.uniform(ks[3]) * 0.05 - 0.025,
            self.obj_height,
        ])
        goal = jnp.stack([
            jax.random.uniform(ks[4]) * 0.2 - 0.25 + xo
            + jax.random.uniform(ks[5]) * 0.04 - 0.02 + 0.05,
            obj[1] - 0.25 - jax.random.uniform(ks[6]) * 0.1
            + jax.random.uniform(ks[7]) * 0.04 - 0.02,
            self.goal_height,
        ])
        # swap: green can on right, tomato on left (align.py:160-164)
        obj_xy, goal_xy = goal[:2], obj[:2]
        obj = obj.at[:2].set(obj_xy)
        goal = goal.at[:2].set(goal_xy)
        a_pos = jnp.stack([obj, goal])
        a_quat = jnp.stack([can_fix, jnp.asarray([1.0, 0, 0, 0])])
        return EpisodeInit(
            qpos=jnp.asarray(constants.robot_task_init_qpos[self.robot_uids]),
            a_pos=a_pos, a_quat=a_quat, task={})

    def evaluate(self, data):
        p, _ = self.actor_pose(data, self.obj_name)
        pg, _ = self.actor_pose(data, self.goal_name)
        in_box = jnp.linalg.norm(p[:2] - pg[:2]) <= YCB_CAN_RADIUS
        grasped = self.is_grasping(data, self.obj_name)
        robot_static = self.agent_is_static(data, 0.2)
        all_static = (self.actor_is_static(data, self.obj_name)
                      & self.actor_is_static(data, self.goal_name))
        success = in_box & (~grasped) & all_static
        return {"is_grasped_0": grasped, "is_obj_in_box": in_box,
                "is_robot_static": robot_static, "is_obj_static": all_static,
                "is_goal_site_static": self.actor_is_static(data, self.goal_name),
                "success": success}

    def _get_obs_extra(self, data, info):
        tcp_p, tcp_q = self.tcp_pose(data)
        pg, _ = self.actor_pose(data, self.goal_name)
        p, q = self.actor_pose(data, self.obj_name)
        return dict(
            tcp_pose=jnp.concatenate([tcp_p, tcp_q]), goal_pos=pg,
            is_grasped=info["is_grasped_0"],
            tcp_to_goal_pos=pg - tcp_p,
            obj_pose=jnp.concatenate([p, q]),
            tcp_to_obj_pos=p - tcp_p, obj_to_goal_pos=pg - p)

    def compute_dense_reward(self, data, action, info):
        tcp_p, _ = self.tcp_pose(data)
        p, _ = self.actor_pose(data, self.obj_name)
        pg, _ = self.actor_pose(data, self.goal_name)
        reward = 1.0 - jnp.tanh(5.0 * jnp.linalg.norm(p - tcp_p))
        grasped = info["is_grasped_0"]
        reward = reward + 1.0 * grasped
        reward = reward + (1.0 - jnp.tanh(5.0 * jnp.linalg.norm(pg - p))) * grasped
        in_box = info["is_obj_in_box"]
        reward = reward + 1.0 * in_box + 1.0 * (in_box & ~grasped)
        reward = reward + 1.0 * (in_box & info["is_obj_static"]
                                 & info["is_robot_static"])
        return jnp.where(info["success"], 6.0, reward)
