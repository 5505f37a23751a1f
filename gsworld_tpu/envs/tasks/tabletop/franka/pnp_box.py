"""PnpBoxFr3Env-v1: pick the mustard bottle and place it into the snack box.

Parity port of tabletop/franka/pnp_box.py:30-252 (env id, max steps 50,
goal box half sizes :98-104, init sampling :115-137 incl. the 50% swap,
evaluate :152-185, dense reward :205+)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from gsworld_tpu import constants
from gsworld_tpu.core.maths import axis_angle_to_quat
from gsworld_tpu.envs.base import EpisodeInit
from gsworld_tpu.envs.registry import register_env
from gsworld_tpu.envs.tasks.real_fr3 import RealFr3
from gsworld_tpu.physics import builders as B

GOAL_HALF = np.array([0.33 * 0.5, 0.195 * 0.5, 0.065 * 0.5], np.float32)


def random_z_quat(key, bounds=(0.0, 2.0 * np.pi)):
    """random_quaternions(lock_x, lock_y): yaw-only random orientation."""
    ang = jax.random.uniform(key, (), minval=bounds[0], maxval=bounds[1])
    return axis_angle_to_quat(jnp.stack([0.0 * ang, 0.0 * ang, ang]))


@register_env("PnpBoxFr3Env-v1", max_episode_steps=50)
class PnpBoxFr3Env(RealFr3):
    SUPPORTED_ROBOTS = ("fr3_umi", "fr3_umi_wrist435")
    goal_thresh = 0.025

    def __init__(self, *args, robot_uids="fr3_umi",
                 robot_init_qpos_noise=0.02, num_envs=1, **kwargs):
        self.x_offset = 0.615
        self.goal_height = 0.033
        self.obj_height = 0.098
        super().__init__(*args, robot_uids=robot_uids, num_envs=num_envs,
                         robot_init_qpos_noise=robot_init_qpos_noise,
                         **kwargs)

    def _load_scene(self):
        # YCB mustard bottle approximated as its bounding convex box
        self._actor_defs = [
            B.box_actor("006_mustard_bottle", [0.048, 0.031, 0.0955],
                        friction=0.6),
            B.box_actor("snack_box", GOAL_HALF, friction=0.6),
        ]
        self.obj_name = "006_mustard_bottle"
        self.goal_name = "snack_box"

    def _initialize_episode(self, key) -> EpisodeInit:
        ks = jax.random.split(key, 6)
        xo = self.x_offset
        obj = jnp.stack([
            jax.random.uniform(ks[0]) * 0.2 - 0.25 + xo,
            jax.random.uniform(ks[1]) * 0.1 + 0.1,
            self.obj_height,
        ])
        goal = jnp.stack([
            jax.random.uniform(ks[2]) * 0.2 - 0.25 + xo,
            jax.random.uniform(ks[3]) * 0.1 - 0.2,
            self.goal_height,
        ])
        q = random_z_quat(ks[4])
        swap = jax.random.uniform(ks[5]) > 0.5
        obj_xy = jnp.where(swap, goal[:2], obj[:2])
        goal_xy = jnp.where(swap, obj[:2], goal[:2])
        obj = obj.at[:2].set(obj_xy)
        goal = goal.at[:2].set(goal_xy)
        a_pos = jnp.stack([obj, goal])
        a_quat = jnp.stack([q, jnp.asarray([1.0, 0, 0, 0])])
        return EpisodeInit(qpos=jnp.asarray(constants.fr3_umi_task_init_qpos),
                           a_pos=a_pos, a_quat=a_quat, task={})

    def evaluate(self, data):
        p, _ = self.actor_pose(data, self.obj_name)
        pg, _ = self.actor_pose(data, self.goal_name)
        half_xy_goal = float(GOAL_HALF[:2].max())
        in_box = jnp.linalg.norm(p[:2] - pg[:2]) <= half_xy_goal - 0.02
        grasped = self.is_grasping(data, self.obj_name)
        robot_static = self.agent_is_static(data, 0.2)
        obj_static = self.actor_is_static(data, self.obj_name)
        success = in_box & (~grasped) & obj_static
        return {"is_grasped": grasped, "is_obj_in_box": in_box,
                "is_robot_static": robot_static, "is_obj_static": obj_static,
                "success": success}

    def _get_obs_extra(self, data, info):
        tcp_p, tcp_q = self.tcp_pose(data)
        pg, _ = self.actor_pose(data, self.goal_name)
        obs = dict(tcp_pose=jnp.concatenate([tcp_p, tcp_q]), goal_pos=pg,
                   is_grasped=info["is_grasped"])
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
        grasped = info["is_grasped"]
        reward = reward + 1.0 * grasped
        transport = 1.0 - jnp.tanh(5.0 * jnp.linalg.norm(pg - p))
        reward = reward + transport * grasped
        in_box = info["is_obj_in_box"]
        reward = reward + 1.0 * in_box + 1.0 * (in_box & ~grasped)
        reward = reward + 1.0 * (in_box & info["is_obj_static"]
                                 & info["is_robot_static"])
        return jnp.where(info["success"], 6.0, reward)
