"""RealXArm6 base env + domain-randomization config.

Parity port of gsworld/mani_skill/envs/tasks/real_xarm_env.py:23-236:
wrist/right D435i cameras from the xarm hand-eye calibrations
(constants.py:527-539), and the SO100GraspCubeDomainRandomizationConfig
dataclass (:23-50) controlling camera pose/fov noise and object
scale/friction/color randomization.
"""

from __future__ import annotations

import dataclasses
from typing import List, Tuple

import numpy as np

from gsworld_tpu import constants
from gsworld_tpu.envs.base import CameraSpec, GsBaseEnv, calib_mat2sapien_trans_mat
from gsworld_tpu.envs.registry import register_env
import gsworld_tpu.envs.agents.xarm6  # noqa: F401 (registers agents)


@dataclasses.dataclass
class SO100GraspCubeDomainRandomizationConfig:
    """real_xarm_env.py:23-50 (dacite-merged dataclass in the reference)."""

    initial_qpos_noise_scale: float = 0.02
    randomize_colors: bool = True
    randomize_lighting: bool = True
    max_camera_offset: Tuple[float, float, float] = (0.025, 0.025, 0.025)
    camera_target_noise: float = 0.005
    camera_view_rot_noise: float = 0.005
    camera_fov_noise: float = 0.0
    obj_scale_range: Tuple[float, float] = (0.95, 1.05)
    obj_friction_mean: float = 0.3
    obj_friction_std: float = 0.05
    obj_friction_bounds: Tuple[float, float] = (0.1, 0.5)
    randomize_obj_color: bool = True


@register_env("RealXArm6-v1", max_episode_steps=200000)
class RealXArm6(GsBaseEnv):
    SUPPORTED_REWARD_MODES = ("none", "dense", "sparse")

    def __init__(self, *args, robot_uids="xarm6_uf_gripper",
                 domain_randomization: bool = False,
                 domain_randomization_config: dict = None, **kwargs):
        self.domain_randomization = domain_randomization
        cfg = SO100GraspCubeDomainRandomizationConfig()
        if domain_randomization_config:
            cfg = dataclasses.replace(cfg, **domain_randomization_config)
        self.domain_randomization_config = cfg
        super().__init__(*args, robot_uids=robot_uids, **kwargs)

    def _default_sensor_configs(self) -> List[CameraSpec]:
        wrist_pose = calib_mat2sapien_trans_mat(constants.xarm_wrist2base)
        right_pose = calib_mat2sapien_trans_mat(constants.xarm_right2base)
        return [
            CameraSpec("wrist_cam", 640, 480, constants.rs_d435i_rgb_k,
                       mount_link=self.agent.ee_link, local_pose=wrist_pose),
            CameraSpec("right_cam", 640, 480, constants.rs_d435i_rgb_k,
                       mount_link=self.agent.base_link, local_pose=right_pose),
        ]

    def _randomize_world(self, world, task, key):
        """Apply the DR config (real_xarm_env.py:163-183, 185-230): per-env
        object friction noise + per-episode camera pose noise."""
        if not self.domain_randomization:
            return world, task
        import jax
        import jax.numpy as jnp
        cfg = self.domain_randomization_config
        k1, k2, k3, k4, k5 = jax.random.split(key, 5)
        A = self.scene.actors.num
        fric = jnp.clip(
            cfg.obj_friction_mean
            + cfg.obj_friction_std * jax.random.normal(k1, (A,)),
            *cfg.obj_friction_bounds)
        world = world.replace(a_friction=fric)
        # obj_scale_range: per-env geometric scale of each object
        # (real_xarm_env.py:170-174) — collision support points/faces and
        # the GS render scale both read world.a_scale
        lo, hi = cfg.obj_scale_range
        world = world.replace(a_scale=jax.random.uniform(
            k4, (A,), minval=lo, maxval=hi))
        # randomize_obj_color: uniform [0,1] per-channel object color
        # (real_xarm_env.py:175-176); the GS wrapper applies it as a
        # per-object color tint on the splats
        if cfg.randomize_colors and cfg.randomize_obj_color:
            task = dict(task)
            task["obj_color"] = jax.random.uniform(k5, (A, 3))
        n_cams = len(self.cameras)
        off = jnp.asarray(cfg.max_camera_offset)
        pos_noise = jax.random.uniform(k2, (n_cams, 3), minval=-1.0,
                                       maxval=1.0) * off
        rot_noise = (cfg.camera_view_rot_noise
                     * jax.random.normal(k3, (n_cams, 3)))
        task = dict(task)
        task["cam_pose_noise"] = jnp.concatenate([pos_noise, rot_noise],
                                                 axis=-1)
        return world, task

    def _default_human_render_camera_configs(self):
        from gsworld_tpu.envs.base import look_at_sapien
        return [CameraSpec(
            "render_camera", 640, 480, constants.rs_d435i_rgb_k,
            mount_link=None,
            local_pose=look_at_sapien([1.7, 1.0, 0.7], [0.0, 0.0, 0.15]))]

    def _initialize_episode(self, key):
        from gsworld_tpu.envs.base import EpisodeInit
        import jax.numpy as jnp
        return EpisodeInit(
            qpos=jnp.asarray(constants.robot_task_init_qpos[self.robot_uids]),
            a_pos=jnp.zeros((0, 3)), a_quat=jnp.zeros((0, 4)), task={})
