"""StackFr3Env-v1: stack the DTC red tomato can onto the YCB tomato soup can.

Parity port of tabletop/franka/stack.py:30-252 (goal = upright YCB can,
obj = DTC red can with the x+90deg rotate fix; init sampling with the
position swap :115-169; success = obj xy within the goal can footprint
(minus 2 cm), not grasped, both cans static :171-210)."""

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

YCB_CAN_RADIUS = 0.033


@register_env("StackFr3Env-v1", max_episode_steps=100)
class StackFr3Env(RealFr3):
    SUPPORTED_ROBOTS = ("fr3_umi", "fr3_umi_wrist435")
    goal_thresh = 0.025

    def __init__(self, *args, robot_uids="fr3_umi",
                 robot_init_qpos_noise=0.02, num_envs=1, **kwargs):
        self.x_offset = 0.615
        self.goal_height = 0.051
        self.obj_height = 0.05
        super().__init__(*args, robot_uids=robot_uids, num_envs=num_envs,
                         robot_init_qpos_noise=robot_init_qpos_noise,
                         **kwargs)

    def _load_scene(self):
        self._actor_defs = [
            # goal: YCB tomato soup can, z-up cylinder
            B.cylinder_actor("005_tomato_soup_can", radius=YCB_CAN_RADIUS,
                             half_length=0.051, axis="z", friction=0.6),
            # obj: DTC red can, y-axis body frame (DTC convention)
            B.cylinder_actor("dtc_red_tomato_can_fr3", radius=0.037,
                             half_length=0.05, axis="y", friction=0.6),
        ]
        self.obj_name = "dtc_red_tomato_can_fr3"
        self.goal_name = "005_tomato_soup_can"

    def _initialize_episode(self, key) -> EpisodeInit:
        ks = jax.random.split(key, 6)
        xo = self.x_offset
        red_fix = quat_multiply(
            axis_angle_to_quat(jnp.asarray([0.0, 0.0, jnp.pi / 4])),
            axis_angle_to_quat(jnp.asarray([jnp.pi / 2, 0.0, 0.0])))
        obj = jnp.stack([
            -0.125 + jax.random.uniform(ks[0]) * 0.125 + xo,
            0.1 + jax.random.uniform(ks[1]) * 0.1,
            self.obj_height,
        ])
        goal = jnp.stack([
            jax.random.uniform(ks[2]) * 0.2 - 0.25 + xo,
            obj[1] - 0.15 - jax.random.uniform(ks[3]) * 0.1,
            self.goal_height,
        ])
        # stack.py:146: obj/goal xy swapped after sampling
        obj_xy, goal_xy = goal[:2], obj[:2]
        obj = obj.at[:2].set(obj_xy)
        goal = goal.at[:2].set(goal_xy)
        a_pos = jnp.stack([goal, obj])
        a_quat = jnp.stack([jnp.asarray([1.0, 0, 0, 0]), red_fix])
        return EpisodeInit(qpos=jnp.asarray(constants.fr3_umi_task_init_qpos),
                           a_pos=a_pos, a_quat=a_quat, task={})

    def evaluate(self, data):
        p, _ = self.actor_pose(data, self.obj_name)
        pg, _ = self.actor_pose(data, self.goal_name)
        in_box = jnp.linalg.norm(p[:2] - pg[:2]) <= YCB_CAN_RADIUS - 0.02
        grasped = self.is_grasping(data, self.obj_name)
        robot_static = self.agent_is_static(data, 0.2)
        obj_static = (self.actor_is_static(data, self.obj_name)
                      & self.actor_is_static(data, self.goal_name))
        success = in_box & (~grasped) & obj_static
        return {"is_grasped_0": grasped, "is_obj_in_box": in_box,
                "is_robot_static": robot_static, "is_obj_static": obj_static,
                "is_goal_site_static": self.actor_is_static(data, self.goal_name),
                "success": success}

    def _get_obs_extra(self, data, info):
        tcp_p, tcp_q = self.tcp_pose(data)
        pg, _ = self.actor_pose(data, self.goal_name)
        obs = dict(tcp_pose=jnp.concatenate([tcp_p, tcp_q]), goal_pos=pg,
                   is_grasped=info["is_grasped_0"])
        if "state" in self.obs_mode:
            p, q = self.actor_pose(data, self.obj_name)
            obs.update(tcp_to_goal_pos=pg - tcp_p,
                       obj_pose=jnp.concatenate([p, q]),
                       tcp_to_obj_pos=p - tcp_p, obj_to_goal_pos=pg - p)
        return obs

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
