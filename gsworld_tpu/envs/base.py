"""Base task environment: batched, fully-jitted reset/step with a
ManiSkill-compatible surface.

The reference's env stack (mani_skill BaseEnv -> RealFr3/RealXArm6 -> task
envs, SURVEY.md §2 C8-C10) is re-designed functionally for TPU: an env is a
*static* description (physics scene, cameras, controller) plus pure
``reset_fn(key)`` / ``step_fn(state, action)`` functions, batched over a
leading env axis and compiled once.  A thin stateful wrapper provides the
familiar gym API (reset(seed=...), step(action), obs dicts with
``agent``/``extra``/``sensor_param`` keys mirroring ManiSkill's layout).

Subclasses implement the same hooks the reference tasks override:
``_load_scene`` (actor defs), ``_initialize_episode`` (per-env randomized
initial state), ``evaluate`` (success predicates), ``_get_obs_extra``,
``compute_dense_reward``.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from gsworld_tpu import constants
from gsworld_tpu.core.maths import quat_to_matrix, tf_from_pq, tf_inverse_rigid
from gsworld_tpu.envs.agents.base import AgentSpec, get_agent
from gsworld_tpu.physics import builders as B
from gsworld_tpu.physics.dynamics import compute_kinematics
from gsworld_tpu.physics.kinematics import forward_kinematics
from gsworld_tpu.physics.world import PhysicsScene, WorldState, control_step

# SAPIEN camera convention -> OpenCV (gsworld_sapien_utils.py:314-343)
SAPIEN2OPENCV = np.array([
    [0.0, -1.0, 0.0, 0.0],
    [0.0, 0.0, -1.0, 0.0],
    [1.0, 0.0, 0.0, 0.0],
    [0.0, 0.0, 0.0, 1.0],
], dtype=np.float32)


def look_at_sapien(eye, target, up=(0, 0, 1)) -> np.ndarray:
    """Camera pose (4x4, SAPIEN convention: forward=+x, left=+y, up=+z)
    looking from eye at target (gsworld_sapien_utils.py:346-392)."""
    eye = np.asarray(eye, np.float64)
    forward = np.asarray(target, np.float64) - eye
    forward /= np.linalg.norm(forward)
    up = np.asarray(up, np.float64)
    up = up / np.linalg.norm(up)
    left = np.cross(up, forward)
    left /= np.linalg.norm(left)
    up = np.cross(forward, left)
    T = np.eye(4)
    T[:3, 0] = forward
    T[:3, 1] = left
    T[:3, 2] = up
    T[:3, 3] = eye
    return T


def calib_mat2sapien_trans_mat(calib_mat: np.ndarray) -> np.ndarray:
    """OpenCV camera-axes matrix -> SAPIEN camera pose: columns
    (x, y, z) -> (z, -x, -y) (gsworld_sapien_utils.py:302-312)."""
    out = np.eye(4, dtype=np.float64)
    out[:3, 0] = calib_mat[:3, 2]
    out[:3, 1] = -calib_mat[:3, 0]
    out[:3, 2] = -calib_mat[:3, 1]
    out[:3, 3] = calib_mat[:3, 3]
    return out


@dataclasses.dataclass(frozen=True)
class CameraSpec:
    """A sensor camera: intrinsics + mount (link-relative SAPIEN pose)."""

    name: str
    width: int
    height: int
    intrinsic: np.ndarray          # (3, 3)
    mount_link: Optional[str]      # None = world-fixed
    local_pose: np.ndarray         # (4, 4) SAPIEN-convention pose in mount frame
    near: float = 0.01
    far: float = 100.0


class EpisodeInit(NamedTuple):
    """Output of _initialize_episode for a single env."""

    qpos: jnp.ndarray      # (dof,)
    a_pos: jnp.ndarray     # (A, 3)
    a_quat: jnp.ndarray    # (A, 4)
    task: Dict[str, jnp.ndarray]


@struct.dataclass
class EnvState:
    world: WorldState
    key: jnp.ndarray          # (B, 2) uint32 per-env keys
    elapsed: jnp.ndarray      # (B,) int32
    prev_target: jnp.ndarray  # (B, dof)
    task: Dict[str, jnp.ndarray]


class GsBaseEnv:
    """Batched functional env with a gym-like stateful facade."""

    SUPPORTED_REWARD_MODES = ("none", "dense", "sparse")
    max_episode_steps: int = 100

    def __init__(self, num_envs: int = 1, robot_uids: str = "fr3_umi",
                 obs_mode: str = "state_dict",
                 control_mode: Optional[str] = None,
                 reward_mode: str = "dense",
                 sim_freq: int = 120, control_freq: int = 40,
                 robot_init_qpos_noise: float = 0.02,
                 sim_config: Optional[dict] = None, **kwargs):
        if sim_config:
            sim_freq = sim_config.get("sim_freq", sim_freq)
            control_freq = sim_config.get("control_freq", control_freq)
        self.num_envs = num_envs
        self.robot_uids = robot_uids
        self.obs_mode = obs_mode
        self.reward_mode = reward_mode
        self.robot_init_qpos_noise = robot_init_qpos_noise
        self.agent: AgentSpec = get_agent(robot_uids)
        self.control_mode = control_mode or self.agent.default_control_mode
        self.controller = self.agent.controller(self.control_mode)

        self._actor_defs: List[B.ActorDef] = []
        self._load_scene()
        # asset upgrade path: when a real collision mesh exists for an
        # actor name (DTC/YCB convex PLYs, reference dtc.py:16-42), it
        # replaces the primitive approximation transparently
        self._actor_defs = [B.actor_from_asset(d) for d in self._actor_defs]
        kp, kd, fl = self.controller.gains()
        self.scene: PhysicsScene = B.make_scene(
            self.agent.model, self.agent.spec, self._actor_defs,
            contact_links=self.agent.contact_links,
            link_friction=self.agent.finger_friction,
            planes=self._scene_planes(),
            kp=kp, kd=kd, force_limit=fl,
            sim_freq=sim_freq, control_freq=control_freq)
        self.actor_index = {n: i for i, n in
                            enumerate(self.scene.actors.names)}
        self._la_pairs = np.asarray(self.scene.la_pairs).reshape(-1, 2)
        self.cameras: List[CameraSpec] = list(self._default_sensor_configs())
        self.human_render_cameras: List[CameraSpec] = list(
            self._default_human_render_camera_configs())

        self._jit_reset = jax.jit(self._reset_fn)
        self._jit_step = jax.jit(self._step_fn)
        self._state: Optional[EnvState] = None

    # ------------------------------------------------------------------ #
    # subclass hooks (single-env; vmapped by the base)
    # ------------------------------------------------------------------ #

    def _load_scene(self) -> None:
        """Append ActorDefs to self._actor_defs."""

    def _scene_planes(self) -> Optional[np.ndarray]:
        """Static contact planes. Tabletop tasks get the bounded table +
        ground (scene_builder.py); empty base envs a ground plane at z=0."""
        if hasattr(self, "x_offset"):
            from gsworld_tpu.envs.scene_builder import TableSceneBuilderOffset
            return TableSceneBuilderOffset(self.x_offset).planes()
        return None

    def _initialize_episode(self, key) -> EpisodeInit:
        raise NotImplementedError

    def evaluate(self, data: Dict[str, Any]) -> Dict[str, jnp.ndarray]:
        return {}

    def _get_obs_extra(self, data, info) -> Dict[str, jnp.ndarray]:
        return {}

    def compute_dense_reward(self, data, action, info) -> jnp.ndarray:
        return jnp.zeros(())

    def _default_sensor_configs(self) -> Sequence[CameraSpec]:
        return ()

    def _default_human_render_camera_configs(self) -> Sequence[CameraSpec]:
        """Third-person view for videos (reference: real_fr3_env.py:61-68)."""
        return [CameraSpec(
            "render_camera", 640, 480, constants.rs_d435i_rgb_k,
            mount_link=None,
            local_pose=look_at_sapien([1.0, 0.2, 0.5], [0.0, 0.0, 0.15]))]

    # ------------------------------------------------------------------ #
    # helpers available to hooks through `data`
    # ------------------------------------------------------------------ #

    def actor_pose(self, data, name):
        i = self.actor_index[name]
        return data["world"].a_pos[i], data["world"].a_quat[i]

    def actor_vel(self, data, name):
        i = self.actor_index[name]
        return data["world"].a_lin[i], data["world"].a_ang[i]

    def link_pose(self, data, name):
        i = self.agent.model.link_id(name)
        return data["link_pos"][i], data["link_quat"][i]

    def tcp_pose(self, data):
        return self.link_pose(data, self.agent.ee_link)

    def pair_force(self, data, link: str, actor: str):
        """World-frame contact force of `actor` on `link` (last substep)."""
        li = self.agent.model.link_id(link)
        ai = self.actor_index[actor]
        rows = np.nonzero((self._la_pairs[:, 0] == li)
                          & (self._la_pairs[:, 1] == ai))[0]
        if len(rows) == 0:
            return jnp.zeros(3)
        return data["world"].la_forces[rows[0]]

    def is_grasping(self, data, actor: str, min_force=0.5, max_angle=85.0):
        forces = jnp.stack([self.pair_force(data, f, actor)
                            for f in self.agent.finger_links])
        quats = jnp.stack([self.link_pose(data, f)[1]
                           for f in self.agent.finger_links])
        return self.agent.is_grasping_from_forces(
            forces, quats, min_force, max_angle)

    def agent_is_static(self, data, threshold=0.2):
        qvel = data["world"].qvel[..., :-len(self.agent.gripper_dof_ids)]
        return jnp.max(jnp.abs(qvel), axis=-1) <= threshold

    def actor_is_static(self, data, name, lin_thresh=0.05, ang_thresh=0.5):
        lin, ang = self.actor_vel(data, name)
        return ((jnp.linalg.norm(lin) < lin_thresh)
                & (jnp.linalg.norm(ang) < ang_thresh))

    # ------------------------------------------------------------------ #
    # functional core
    # ------------------------------------------------------------------ #

    def _env_data(self, world: WorldState):
        link_pos, link_quat = forward_kinematics(
            self.agent.model, world.qpos, world.root_pos, world.root_quat)
        return {"world": world, "link_pos": link_pos, "link_quat": link_quat}

    def _randomize_world(self, world: WorldState, task, key):
        """Per-episode domain randomization hook (friction, camera noise,
        ...); returns (world, task)."""
        return world, task

    def _single_reset(self, key):
        init_key, dr_key, run_key = jax.random.split(key, 3)
        ep = self._initialize_episode(init_key)
        A = self.scene.actors.num
        n_la = max(len(self._la_pairs), 1)
        from gsworld_tpu.physics.world import contact_row_count
        world = WorldState(
            qpos=ep.qpos, qvel=jnp.zeros(self.agent.model.dof),
            root_pos=jnp.zeros(3), root_quat=jnp.asarray([1.0, 0, 0, 0]),
            a_pos=ep.a_pos, a_quat=ep.a_quat,
            a_lin=jnp.zeros((A, 3)), a_ang=jnp.zeros((A, 3)),
            la_forces=jnp.zeros((n_la, 3)),
            contact_lam=jnp.zeros((contact_row_count(self.scene), 6)),
            a_friction=jnp.asarray(self.scene.actors.friction),
            a_scale=jnp.ones((A,)))
        world, task = self._randomize_world(world, ep.task, dr_key)
        return world, run_key, ep.qpos, task

    def _reset_fn(self, keys):
        world, run_keys, q0, task = jax.vmap(self._single_reset)(keys)
        state = EnvState(world=world, key=run_keys,
                         elapsed=jnp.zeros(self.num_envs, jnp.int32),
                         prev_target=q0, task=task)
        obs = self._observations(state)
        return state, obs

    def _single_step(self, world, prev_target, action):
        target = self.controller.compute_targets(
            world.qpos, prev_target, action,
            root_pos=world.root_pos, root_quat=world.root_quat)
        world = control_step(self.scene, world, target)
        return world, target

    def update_task_state(self, data, task):
        """Optional per-step task-state update (e.g. sticky has_poured flags,
        pour_mustard.py:178-190). Single-env; vmapped by the base."""
        return task

    def _step_fn(self, state: EnvState, action):
        world, target = jax.vmap(self._single_step)(
            state.world, state.prev_target, action)
        elapsed = state.elapsed + 1
        state = EnvState(world=world, key=state.key, elapsed=elapsed,
                         prev_target=target, task=state.task)
        if state.task:
            data = self._vmapped_data(state)
            new_task = jax.vmap(
                lambda d: self.update_task_state(
                    {k: v for k, v in d.items() if k != "task"}, d["task"])
            )(data)
            state = EnvState(world=world, key=state.key, elapsed=elapsed,
                             prev_target=target, task=new_task)
        obs = self._observations(state)
        info = self._info(state)
        if self.reward_mode == "dense":
            reward = jax.vmap(self.compute_dense_reward)(
                self._vmapped_data(state), action, info)
        elif self.reward_mode == "sparse":
            reward = info.get(
                "success", jnp.zeros(self.num_envs, bool)).astype(jnp.float32)
        else:
            reward = jnp.zeros(self.num_envs, jnp.float32)
        terminated = info.get("success", jnp.zeros(self.num_envs, bool))
        if "fail" in info:
            terminated = terminated | info["fail"]
        truncated = elapsed >= self.max_episode_steps
        return state, obs, reward, terminated, truncated, info

    def _vmapped_data(self, state: EnvState):
        data = jax.vmap(self._env_data)(state.world)
        data["task"] = state.task
        return data

    def _info(self, state: EnvState):
        data = self._vmapped_data(state)
        return jax.vmap(lambda d: self.evaluate(d))(data)

    def _observations(self, state: EnvState):
        data = self._vmapped_data(state)
        info = jax.vmap(lambda d: self.evaluate(d))(data)
        obs = {
            "agent": {"qpos": state.world.qpos, "qvel": state.world.qvel},
            "extra": jax.vmap(lambda d, i: self._get_obs_extra(d, i))(
                data, info),
        }
        if self.cameras:
            obs["sensor_param"] = self.sensor_params(state)
        return obs

    # ------------------------------------------------------------------ #
    # cameras
    # ------------------------------------------------------------------ #

    def camera_extrinsics_cv(self, state: EnvState, cameras=None):
        """(B, n_cams, 4, 4) OpenCV world->cam extrinsics from FK."""
        cameras = self.cameras if cameras is None else cameras
        link_pos, link_quat = jax.vmap(
            lambda w: forward_kinematics(self.agent.model, w.qpos,
                                         w.root_pos, w.root_quat))(state.world)
        outs = []
        s2cv = jnp.asarray(SAPIEN2OPENCV)
        for cam in cameras:
            local = jnp.asarray(cam.local_pose, jnp.float32)
            if cam.mount_link is None:
                pose = jnp.broadcast_to(local, (self.num_envs, 4, 4))
            else:
                li = self.agent.model.link_id(cam.mount_link)
                T_link = tf_from_pq(link_pos[:, li], link_quat[:, li])
                pose = T_link @ local
            noise = (state.task or {}).get("cam_pose_noise")
            if noise is not None and cameras is self.cameras:
                from gsworld_tpu.core.maths import axis_angle_to_quat
                ci = min(len(outs), noise.shape[1] - 1)
                dT = tf_from_pq(noise[:, ci, :3],
                                axis_angle_to_quat(noise[:, ci, 3:6]))
                pose = pose @ dT
            outs.append(s2cv @ tf_inverse_rigid(pose))
        return jnp.stack(outs, axis=1)

    def sensor_params(self, state: EnvState):
        ext = self.camera_extrinsics_cv(state)
        return {
            cam.name: {
                "extrinsic_cv": ext[:, i, :3, :],
                "intrinsic_cv": jnp.broadcast_to(
                    jnp.asarray(cam.intrinsic, jnp.float32),
                    (self.num_envs, 3, 3)),
            }
            for i, cam in enumerate(self.cameras)
        }

    # ------------------------------------------------------------------ #
    # gym facade
    # ------------------------------------------------------------------ #

    @property
    def action_dim(self) -> int:
        return self.controller.action_dim

    def action_space_sample(self, key):
        return jax.random.uniform(key, (self.num_envs, self.action_dim),
                                  minval=-1.0, maxval=1.0)

    def reset(self, seed: Optional[int] = None, options: Optional[dict] = None):
        seed = 0 if seed is None else seed
        keys = jax.random.split(jax.random.PRNGKey(seed), self.num_envs)
        self._state, obs = self._jit_reset(keys)
        return obs, {}

    def step(self, action):
        action = jnp.asarray(action, jnp.float32)
        if action.ndim == 1:
            action = jnp.broadcast_to(action, (self.num_envs,) + action.shape)
        (self._state, obs, reward, terminated, truncated,
         info) = self._jit_step(self._state, action)
        return obs, reward, terminated, truncated, info

    def get_state_dict(self):
        """ManiSkill-style state dict (gs_world_wrapper.py:135-139 reads
        ['actors'][name][:, :7] = pos+quat)."""
        w = self._state.world
        actors = {
            name: jnp.concatenate(
                [w.a_pos[:, i], w.a_quat[:, i], w.a_lin[:, i], w.a_ang[:, i]],
                axis=-1)
            for i, name in enumerate(self.scene.actors.names)
        }
        return {"actors": actors,
                "articulations": {self.agent.uid: jnp.concatenate(
                    [w.qpos, w.qvel], axis=-1)}}

    @property
    def state(self) -> EnvState:
        return self._state
