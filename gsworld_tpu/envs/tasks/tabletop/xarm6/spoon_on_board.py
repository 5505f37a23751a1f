"""SpoonOnBoardXArmEnv-v1: place the wooden spoon onto the cutting board.

Parity port of tabletop/xarm6/spoon_on_board.py:26-280: spoon (DTC wooden
spoon) resting on two support blocks, cutting-board goal; success = spoon xy
within the board footprint (0.15 x 0.1 minus 2 cm margin), z within 5 cm of
the goal, not grasped (max_angle=180), robot static (:190-230)."""

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

SPOON_NAME = "dtc:Kitchen_Spoon_B008H2JLP8_LargeWooden"
BOARD_NAME = "dtc:Cutting_Board_B005CZ90HM_LimeGreen"
BOARD_HALF_X, BOARD_HALF_Y = 0.15, 0.1


@register_env("SpoonOnBoardXArmEnv-v1", max_episode_steps=100)
class SpoonOnBoardXArmEnv(RealXArm6):
    SUPPORTED_ROBOTS = ("xarm6_uf_gripper", "xarm6_uf_gripper_wrist435")
    goal_thresh = 0.025

    def __init__(self, *args, robot_uids="xarm6_uf_gripper",
                 robot_init_qpos_noise=0.02, num_envs=1, **kwargs):
        self.x_offset = 0.615
        self.goal_height = 0.012
        self.obj_height = 0.0
        super().__init__(*args, robot_uids=robot_uids, num_envs=num_envs,
                         robot_init_qpos_noise=robot_init_qpos_noise,
                         **kwargs)

    def _load_scene(self):
        self._actor_defs = [
            # spoon: long thin convex (20 cm), DTC frame (length on x pre-fix)
            B.box_actor(SPOON_NAME, [0.10, 0.022, 0.012], friction=0.6),
            # cutting board: flat box
            B.box_actor(BOARD_NAME, [BOARD_HALF_X, BOARD_HALF_Y, 0.006],
                        friction=0.6),
            # two support blocks under the spoon (spoon_on_board.py:118-130)
            B.box_actor("support_block_0", [0.02, 0.02, 0.005], friction=0.8),
            B.box_actor("support_block_1", [0.02, 0.02, 0.005], friction=0.8),
        ]
        self.obj_name = SPOON_NAME
        self.goal_name = BOARD_NAME

    def _single_reset(self, key):
        world, run_key, q0, task = super()._single_reset(key)
        world = world.replace(
            root_pos=jnp.asarray([self.x_offset - 0.615, 0.0, 0.03]))
        return world, run_key, q0, task

    def _initialize_episode(self, key) -> EpisodeInit:
        ks = jax.random.split(key, 4)
        xo = self.x_offset
        spoon = jnp.stack([
            xo - 0.3 + jax.random.uniform(ks[0]) * 0.05,
            -0.05 + jax.random.uniform(ks[1]) * 0.05,
            self.obj_height + 0.01,
        ])
        spoon_q = quat_multiply(
            axis_angle_to_quat(jnp.asarray([0.0, 0.0, jnp.pi / 2])),
            axis_angle_to_quat(jnp.asarray([jnp.pi / 2, 0.0, 0.0])))
        board = jnp.stack([
            xo - 0.3 + jax.random.uniform(ks[2]) * 0.1,
            0.15 + jax.random.uniform(ks[3]) * 0.1,
            self.goal_height,
        ])
        board_q = axis_angle_to_quat(jnp.asarray([-jnp.pi / 2, 0.0, 0.0]))
        block_offset = 0.20 / 3.0
        blk0 = jnp.stack([spoon[0] - block_offset, spoon[1],
                          jnp.asarray(0.005)])
        blk1 = jnp.stack([spoon[0] + block_offset, spoon[1],
                          jnp.asarray(0.005)])
        eye_q = jnp.asarray([1.0, 0, 0, 0])
        a_pos = jnp.stack([spoon, board, blk0, blk1])
        a_quat = jnp.stack([spoon_q, board_q, eye_q, eye_q])
        task = {"goal_pos": board.at[2].set(self.goal_height + 0.01)}
        return EpisodeInit(
            qpos=jnp.asarray(constants.robot_task_init_qpos[self.robot_uids]),
            a_pos=a_pos, a_quat=a_quat, task=task)

    def evaluate(self, data):
        p, _ = self.actor_pose(data, self.obj_name)
        goal = data["task"]["goal_pos"]
        off = p[:2] - goal[:2]
        in_xy = ((jnp.abs(off[0]) <= BOARD_HALF_X - 0.02)
                 & (jnp.abs(off[1]) <= BOARD_HALF_Y - 0.02))
        z_ok = jnp.abs(p[2] - goal[2]) <= 0.05
        grasped = self.is_grasping(data, self.obj_name, max_angle=180.0)
        robot_static = self.agent_is_static(data, 0.2)
        spoon_static = self.actor_is_static(data, self.obj_name)
        success = in_xy & z_ok & (~grasped) & robot_static
        return {"is_grasped": grasped,
                "is_spoon_on_board": in_xy & z_ok,
                "is_robot_static": robot_static,
                "is_spoon_static": spoon_static,
                "success": success}

    def _get_obs_extra(self, data, info):
        tcp_p, tcp_q = self.tcp_pose(data)
        pg, _ = self.actor_pose(data, self.goal_name)
        obs = dict(tcp_pose=jnp.concatenate([tcp_p, tcp_q]), goal_pos=pg,
                   is_grasped=info["is_grasped"])
        if "state" in self.obs_mode:
            p, q = self.actor_pose(data, self.obj_name)
            obs.update(tcp_to_goal_pos=pg - tcp_p,
                       spoon_pose=jnp.concatenate([p, q]),
                       tcp_to_spoon_pos=p - tcp_p,
                       spoon_to_board_pos=pg - p)
        return obs

    def compute_dense_reward(self, data, action, info):
        tcp_p, _ = self.tcp_pose(data)
        p, _ = self.actor_pose(data, self.obj_name)
        pg, _ = self.actor_pose(data, self.goal_name)
        reward = 1.0 - jnp.tanh(5.0 * jnp.linalg.norm(p - tcp_p))
        grasped = info["is_grasped"]
        reward = reward + 2.0 * grasped
        reward = reward + (1.0 - jnp.tanh(5.0 * jnp.linalg.norm(pg - p))) * grasped
        reward = reward + 2.0 * info["is_spoon_on_board"]
        return jnp.where(info["success"], 8.0, reward)
