"""PourMustardFr3Env-v1: grasp the mustard bottle and tilt it over the
bread-slice box.

Parity port of tabletop/franka/pour_mustard.py:29-276: pour detection =
|euler_x| > pi/10 while within 0.15 m xy of the box (:160-190); sticky
``has_poured`` and incrementing ``pouring_state`` task state (:101-110,
:178-190); success = grasped & above box (:206)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from gsworld_tpu import constants
from gsworld_tpu.core.maths import matrix_to_euler_xyz, quat_to_matrix
from gsworld_tpu.envs.base import EpisodeInit
from gsworld_tpu.envs.registry import register_env
from gsworld_tpu.envs.tasks.real_fr3 import RealFr3
from gsworld_tpu.envs.tasks.tabletop.franka.pnp_box import random_z_quat
from gsworld_tpu.physics import builders as B

GOAL_HALF = np.array([0.14 * 0.5, 0.115 * 0.5, 0.015 * 0.5], np.float32)


@register_env("PourMustardFr3Env-v1", max_episode_steps=50)
class PourMustardFr3Env(RealFr3):
    SUPPORTED_ROBOTS = ("fr3_umi", "fr3_umi_wrist435")
    pour_angle_thresh = np.pi / 10
    pour_position_thresh = 0.15

    def __init__(self, *args, robot_uids="fr3_umi",
                 robot_init_qpos_noise=0.02, num_envs=1, **kwargs):
        self.x_offset = 0.615
        self.bottle_height = 0.098
        self.goal_height = 0.010
        super().__init__(*args, robot_uids=robot_uids, num_envs=num_envs,
                         robot_init_qpos_noise=robot_init_qpos_noise,
                         **kwargs)

    def _load_scene(self):
        self._actor_defs = [
            B.box_actor("006_mustard_bottle", [0.048, 0.031, 0.0955],
                        friction=0.6),
            B.box_actor("bread_slice", GOAL_HALF, friction=0.6),
        ]
        self.obj_name = "006_mustard_bottle"
        self.goal_name = "bread_slice"

    def _initialize_episode(self, key) -> EpisodeInit:
        ks = jax.random.split(key, 8)
        xo = self.x_offset
        bottle = jnp.stack([
            jax.random.uniform(ks[0]) * 0.2 - 0.3 + xo,
            jax.random.uniform(ks[1]) * 0.1 + 0.1,
            self.bottle_height,
        ])
        q = random_z_quat(ks[2], bounds=(0.0, np.pi * 0.5))
        box = jnp.stack([
            jax.random.uniform(ks[3]) * 0.2 - 0.3 + xo,
            jax.random.uniform(ks[4]) * 0.1 - 0.2,
            self.goal_height / 2,
        ])

        def cond(carry):
            i, k, b = carry
            return (jnp.linalg.norm(bottle[:2] - b[:2]) < 0.15) & (i < 16)

        def body(carry):
            i, k, _ = carry
            k, k1, k2 = jax.random.split(k, 3)
            b = jnp.stack([
                jax.random.uniform(k1) * 0.2 - 0.3 + xo,
                jax.random.uniform(k2) * 0.1 - 0.2,
                self.goal_height / 2,
            ])
            return (i + 1, k, b)

        _, _, box = jax.lax.while_loop(cond, body, (0, ks[5], box))
        swap = jax.random.uniform(ks[6]) > 0.5
        b_xy = jnp.where(swap, box[:2], bottle[:2])
        g_xy = jnp.where(swap, bottle[:2], box[:2])
        bottle = bottle.at[:2].set(b_xy)
        box = box.at[:2].set(g_xy)
        a_pos = jnp.stack([bottle, box])
        a_quat = jnp.stack([q, jnp.asarray([1.0, 0, 0, 0])])
        task = {"has_poured": jnp.zeros((), bool),
                "pouring_state": jnp.zeros(())}
        return EpisodeInit(qpos=jnp.asarray(constants.fr3_umi_task_init_qpos),
                           a_pos=a_pos, a_quat=a_quat, task=task)

    def _pour_predicates(self, data):
        p, q = self.actor_pose(data, self.obj_name)
        pg, _ = self.actor_pose(data, self.goal_name)
        euler = matrix_to_euler_xyz(quat_to_matrix(q))
        tilt = jnp.abs(euler[0])
        above = jnp.linalg.norm(p[:2] - pg[:2]) < self.pour_position_thresh
        return above, tilt > self.pour_angle_thresh

    def update_task_state(self, data, task):
        above, tilted = self._pour_predicates(data)
        pouring = above & tilted
        return {
            "has_poured": task["has_poured"] | pouring,
            "pouring_state": jnp.where(
                pouring, jnp.minimum(task["pouring_state"] + 0.1, 1.0),
                task["pouring_state"]),
        }

    def evaluate(self, data):
        task = data["task"]
        above, tilted = self._pour_predicates(data)
        grasped = self.is_grasping(data, self.obj_name)
        robot_static = self.agent_is_static(data, 0.2)
        obj_static = self.actor_is_static(data, self.obj_name)
        success = grasped & above
        return {
            "is_grasped": grasped, "is_above_box": above,
            "is_tilted_enough": tilted,
            "has_poured": task["has_poured"] | (above & tilted),
            "is_robot_static": robot_static, "is_obj_static": obj_static,
            "pouring_state": task["pouring_state"],
            "success": success,
        }

    def _get_obs_extra(self, data, info):
        tcp_p, tcp_q = self.tcp_pose(data)
        pg, _ = self.actor_pose(data, self.goal_name)
        obs = dict(tcp_pose=jnp.concatenate([tcp_p, tcp_q]), goal_pos=pg,
                   is_grasped=info["is_grasped"],
                   has_poured=info["has_poured"],
                   pouring_state=info["pouring_state"])
        if "state" in self.obs_mode:
            p, q = self.actor_pose(data, self.obj_name)
            obs.update(tcp_to_goal_pos=pg - tcp_p,
                       obj_pose=jnp.concatenate([p, q]),
                       tcp_to_obj_pos=p - tcp_p, obj_to_goal_pos=pg - p)
        return obs

    def compute_dense_reward(self, data, action, info):
        tcp_p, _ = self.tcp_pose(data)
        p, _ = self.actor_pose(data, self.obj_name)
        reward = 1.0 - jnp.tanh(5.0 * jnp.linalg.norm(p - tcp_p))
        reward = reward + 1.0 * info["is_grasped"]
        reward = reward + 1.0 * (info["is_grasped"] & info["is_above_box"])
        reward = reward + 2.0 * info["has_poured"]
        return jnp.where(info["success"], 6.0, reward)
