"""BananaRotationXArmEnv-v1: rotate the banana by more than 30 degrees while
keeping it on the table.

Parity port of tabletop/xarm6/rotate_banana.py:25-211: banana spawns with
the fixed init quat (yaw +90deg, :73), success = rotation from the initial
orientation > 30deg, at table height band [0.02, 0.05] from obj_height,
not grasped (max_angle=180 grasp check), robot static (:174-199)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from gsworld_tpu import constants
from gsworld_tpu.core.maths import axis_angle_to_quat, quat_angle_between
from gsworld_tpu.envs.base import EpisodeInit
from gsworld_tpu.envs.registry import register_env
from gsworld_tpu.envs.tasks.real_xarm import RealXArm6
from gsworld_tpu.physics import builders as B


@register_env("BananaRotationXArmEnv-v1", max_episode_steps=100)
class BananaRotationXArmEnv(RealXArm6):
    SUPPORTED_ROBOTS = ("xarm6_uf_gripper", "xarm6_uf_gripper_wrist435")
    rotation_thresh = 30.0   # degrees

    def __init__(self, *args, robot_uids="xarm6_uf_gripper",
                 robot_init_qpos_noise=0.02, num_envs=1, **kwargs):
        self.x_offset = 0.615
        self.obj_height = 0.019
        super().__init__(*args, robot_uids=robot_uids, num_envs=num_envs,
                         robot_init_qpos_noise=robot_init_qpos_noise,
                         **kwargs)

    def _load_scene(self):
        # YCB banana approximated by a flat convex box (~19 x 4 x 3.6 cm)
        self._actor_defs = [
            B.box_actor("011_banana", [0.095, 0.019, 0.018], friction=0.6),
        ]
        self.obj_name = "011_banana"

    def _single_reset(self, key):
        world, run_key, q0, task = super()._single_reset(key)
        world = world.replace(
            root_pos=jnp.asarray([self.x_offset - 0.615, 0.0, 0.03]))
        return world, run_key, q0, task

    def _banana_init_q(self):
        return axis_angle_to_quat(jnp.asarray([0.0, 0.0, jnp.pi / 2]))

    def _initialize_episode(self, key) -> EpisodeInit:
        ks = jax.random.split(key, 2)
        xo = self.x_offset
        pos = jnp.stack([
            xo + jax.random.uniform(ks[0]) * 0.2 - 0.3,
            jax.random.uniform(ks[1]) * 0.2 - 0.1,
            self.obj_height,
        ])
        q0 = self._banana_init_q()
        return EpisodeInit(
            qpos=jnp.asarray(constants.robot_task_init_qpos[self.robot_uids]),
            a_pos=pos[None], a_quat=q0[None], task={})

    def evaluate(self, data):
        p, q = self.actor_pose(data, self.obj_name)
        rotation_diff = quat_angle_between(q, self._banana_init_q())
        is_rot = rotation_diff > self.rotation_thresh
        dz = jnp.abs(p[2] - self.obj_height)
        at_height = (dz <= 0.05) & (dz >= 0.02)
        grasped = self.is_grasping(data, self.obj_name, max_angle=180.0)
        robot_static = self.agent_is_static(data, 0.2)
        banana_static = self.actor_is_static(data, self.obj_name)
        success = is_rot & at_height & (~grasped) & robot_static
        return {"is_grasped": grasped, "is_rotation_correct": is_rot,
                "is_at_table_height": at_height,
                "is_robot_static": robot_static,
                "is_banana_static": banana_static,
                "rotation_diff_degrees": rotation_diff,
                "success": success}

    def _get_obs_extra(self, data, info):
        tcp_p, tcp_q = self.tcp_pose(data)
        p, q = self.actor_pose(data, self.obj_name)
        return dict(tcp_pose=jnp.concatenate([tcp_p, tcp_q]),
                    obj_pose=jnp.concatenate([p, q]),
                    is_grasped=info["is_grasped"],
                    rotation_diff=info["rotation_diff_degrees"])

    def compute_dense_reward(self, data, action, info):
        tcp_p, _ = self.tcp_pose(data)
        p, _ = self.actor_pose(data, self.obj_name)
        reward = 1.0 - jnp.tanh(5.0 * jnp.linalg.norm(p - tcp_p))
        reward = reward + 1.0 * info["is_grasped"]
        reward = reward + 2.0 * jnp.tanh(
            info["rotation_diff_degrees"] / self.rotation_thresh)
        return jnp.where(info["success"], 6.0, reward)
