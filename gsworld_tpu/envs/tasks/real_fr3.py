"""RealFr3 base env: empty scene with the real-calibrated cameras.

Parity port of gsworld/mani_skill/envs/tasks/real_fr3_env.py:22-123 —
wrist D435i mounted on the end-effector link (hand-eye calib ``wrist2eef``)
and a base-mounted right camera (``right2base``), both 640x480 with the
RealSense D435i intrinsics (constants.py:507-525).
"""

from __future__ import annotations

import numpy as np

from gsworld_tpu import constants
from gsworld_tpu.envs.base import CameraSpec, GsBaseEnv, calib_mat2sapien_trans_mat
from gsworld_tpu.envs.registry import register_env
import gsworld_tpu.envs.agents.fr3_umi  # noqa: F401 (registers agents)


@register_env("RealFr3-v1", max_episode_steps=200000)
class RealFr3(GsBaseEnv):
    SUPPORTED_REWARD_MODES = ("none", "dense", "sparse")

    def __init__(self, *args, robot_uids="fr3_umi", **kwargs):
        super().__init__(*args, robot_uids=robot_uids, **kwargs)

    def _default_sensor_configs(self):
        wrist_pose = calib_mat2sapien_trans_mat(constants.wrist2eef)
        right_pose = calib_mat2sapien_trans_mat(constants.right2base)
        return [
            CameraSpec("wrist_cam", 640, 480, constants.rs_d435i_rgb_k,
                       mount_link=self.agent.ee_link, local_pose=wrist_pose),
            CameraSpec("right_cam", 640, 480, constants.rs_d435i_rgb_k,
                       mount_link=self.agent.base_link, local_pose=right_pose),
        ]

    def _default_human_render_camera_configs(self):
        # 640x480 real-intrinsics human render camera looking at the
        # workspace (reference real_fr3_env.py:61-68)
        from gsworld_tpu.envs.base import look_at_sapien
        return [CameraSpec(
            "render_camera", 640, 480, constants.rs_d435i_rgb_k,
            mount_link=None,
            local_pose=look_at_sapien([1.0, 0.2, 0.5], [0.0, 0.0, 0.15]))]

    def _initialize_episode(self, key):
        from gsworld_tpu.envs.base import EpisodeInit
        import jax.numpy as jnp
        return EpisodeInit(
            qpos=jnp.asarray(constants.robot_task_init_qpos[self.robot_uids]),
            a_pos=jnp.zeros((0, 3)), a_quat=jnp.zeros((0, 4)), task={})
