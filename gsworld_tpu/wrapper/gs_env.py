"""GSWorldWrapper: photorealistic GS rendering fused into the env step.

The reference wrapper (gsworld/mani_skill/utils/wrappers/gs_world_wrapper.py:
29-325) runs per step: SAPIEN physics -> read link/actor poses -> per-link
``isin``-mask transforms with a full-model deepcopy per env -> CUDA rasterize
per env per camera on the host loop.  Here the whole pipeline —

    control_step (physics) -> FK -> slot-transform stack -> repose ->
    project -> bin -> composite (per camera)

— is ONE jitted XLA program, batched over envs (SURVEY.md §2.4 row 1, §7.3
item 6: one base scene + per-env (S, 4x4) transform stacks; static
background Gaussians are never copied).

Per-link transform parity (gs_world_wrapper.py:110-131):
    delta_l = sim2gs . T_link . T_link_scan^-1 . sim2gs^-1        (rigid)
Per-object parity (gs_world_wrapper.py:135-162):
    full_o = sim2gs . (T_actor + offset) . sim2gs_obj^-1
    -> polar-decomposed rigid + uniform scale * object_scale
Camera parity (gs_world_wrapper.py:277-325): render/camera.cam_maniskill2gs.

Scan-pose link mats come from one FK evaluation at ``robot_scan_qpos``
instead of the reference's throwaway second env (SURVEY.md §3.4).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from gsworld_tpu import constants
from gsworld_tpu.core.maths import (
    extract_rigid_transform,
    extract_rigid_transform_fast,
    tf_from_pq,
    tf_inverse_rigid,
)
from gsworld_tpu.envs.base import GsBaseEnv
from gsworld_tpu.gs.scene_factory import get_scene
from gsworld_tpu.gs.transform import SlotTransforms, repose_scene
from gsworld_tpu.physics.kinematics import forward_kinematics
from gsworld_tpu.physics.spec_io import load_surface_points
from gsworld_tpu.render.camera import RasterConfig, cam_maniskill2gs
from gsworld_tpu.render.rasterize import render as gs_render


class GSWorldWrapper:
    """Wraps a GsBaseEnv; obs['sensor_data'][cam]['rgb'] becomes the GS
    render (uint8, (B, H, W, 3)), same contract as the reference."""

    def __init__(self, env: GsBaseEnv, scene_gs_cfg_name: str,
                 raster_config: Optional[RasterConfig] = None,
                 asset_dir: Optional[str] = None,
                 cfg_dir: Optional[str] = None,
                 synthetic_sizes: Optional[dict] = None,
                 log_state: bool = False,
                 state_log_path: str = "./exp_log",
                 batch_frames: bool = False):
        self.batch_frames = batch_frames
        self.env = env
        # episode-state logging for recovery (gs_world_wrapper.py:40-41,49;
        # the reference stores the intent but never wires the save — here
        # save_state_log() actually persists restorable bundles)
        self.log_state = log_state
        self.state_log_path = state_log_path
        self._state_log_count = 0
        self.num_envs = env.num_envs
        self.scene_gs_cfg_name = scene_gs_cfg_name
        model = env.agent.model

        gs_sem, sim2gs = constants.robot_calibration(scene_gs_cfg_name)
        self.sim2gs = np.asarray(sim2gs, np.float64)
        # host-side polar decomposition (pcd_utils.py:224-252 recipe); numpy
        # SVD — the TPU backend has no SVD lowering
        U, S, Vh = np.linalg.svd(self.sim2gs[:3, :3])
        self.rigid_sim2real = np.eye(4, dtype=np.float32)
        self.rigid_sim2real[:3, :3] = (U @ Vh).astype(np.float32)
        self.rigid_sim2real[:3, 3] = self.sim2gs[:3, 3]
        self.scale_sim2real = float(S.mean())

        # objects present both in the env scene and the calibration DB
        self.gs_objects = [n for n in env.scene.actors.names
                           if n in constants.sim2gs_object_transforms]

        scan_qpos = constants.robot_scan_qpos[env.robot_uids]
        try:
            surface = load_surface_points(env.robot_uids)
        except FileNotFoundError:
            surface = None
        self.scene, self.layout, self.is_real_scene = get_scene(
            scene_gs_cfg_name, model, scan_qpos, self.gs_objects,
            link_names=list(model.link_names), asset_dir=asset_dir,
            cfg_dir=cfg_dir, synthetic_sizes=synthetic_sizes,
            surface_points=surface)

        # canonical link poses at the scan qpos (one FK; SURVEY.md §3.4)
        pos0, quat0 = forward_kinematics(model, jnp.asarray(scan_qpos))
        self.inv_gs_link_pose0 = np.asarray(
            tf_inverse_rigid(tf_from_pq(pos0, quat0)))          # (L, 4, 4)

        # per-object static transforms
        self.obj_slot = np.asarray(
            [self.layout.object_slots[n] for n in self.gs_objects], np.int32)
        self.obj_actor_idx = np.asarray(
            [env.actor_index[n] for n in self.gs_objects], np.int32)
        self.inv_sim2gs_obj = np.stack([
            np.linalg.inv(np.asarray(
                constants.sim2gs_object_transforms[n], np.float64))
            for n in self.gs_objects]) if self.gs_objects else np.zeros((0, 4, 4))
        self.obj_offset = np.stack([
            np.asarray(constants.object_offset.get(n, [0, 0, 0]), np.float64)
            for n in self.gs_objects]) if self.gs_objects else np.zeros((0, 3))
        self.obj_scale = np.asarray(
            [constants.object_scale.get(n, 1.0) for n in self.gs_objects],
            np.float32)
        self.link_offset = np.asarray(
            constants.object_offset["xarm_arm"], np.float32) \
            if "xarm" in env.robot_uids else np.zeros(3, np.float32)

        cam0 = env.cameras[0] if env.cameras else None
        self.raster_config = raster_config or RasterConfig(
            width=cam0.width if cam0 else 640,
            height=cam0.height if cam0 else 480)

        self._jit_render = jax.jit(self._render_fn)
        self._jit_step = jax.jit(self._step_and_render)
        self._jit_reset = jax.jit(self._reset_and_render)

    # ------------------------------------------------------------------ #

    def _slots_single(self, link_pos, link_quat, a_pos, a_quat,
                      a_scale=None):
        """Per-env transform stack in layout slot order."""
        if a_scale is None:
            a_scale = jnp.ones((a_pos.shape[0],))
        S = self.layout.num_slots
        model = self.env.agent.model
        sim2gs = jnp.asarray(self.sim2gs, jnp.float32)
        inv_sim2gs = jnp.asarray(np.linalg.inv(self.sim2gs), jnp.float32)

        R = jnp.tile(jnp.eye(3, dtype=jnp.float32), (S, 1, 1))
        t = jnp.zeros((S, 3), jnp.float32)
        s = jnp.ones((S,), jnp.float32)

        # links: delta = sim2gs . T_link . T0^-1 . sim2gs^-1
        T_link = tf_from_pq(link_pos + self.link_offset, link_quat)  # (L,4,4)
        delta = (sim2gs @ T_link
                 @ jnp.asarray(self.inv_gs_link_pose0, jnp.float32)
                 @ inv_sim2gs)
        link_slots = jnp.asarray(self.layout.link_slots)
        R = R.at[link_slots].set(delta[:, :3, :3])
        t = t.at[link_slots].set(delta[:, :3, 3])

        # objects: full = sim2gs . (pose+offset) . sim2gs_obj^-1
        if len(self.gs_objects):
            ai = jnp.asarray(self.obj_actor_idx)
            T_act = tf_from_pq(a_pos[ai] + jnp.asarray(self.obj_offset,
                                                       jnp.float32),
                               a_quat[ai])
            full = sim2gs @ T_act @ jnp.asarray(self.inv_sim2gs_obj,
                                                jnp.float32)
            _, scale, R_obj, t_obj = extract_rigid_transform_fast(full)
            oslots = jnp.asarray(self.obj_slot)
            R = R.at[oslots].set(R_obj)
            t = t.at[oslots].set(t_obj)
            s = s.at[oslots].set(scale * jnp.asarray(self.obj_scale)
                                 * a_scale[ai])

        return SlotTransforms(R=R, t=t, scale=s,
                              apply_scale=jnp.asarray(self.layout.scaled))

    def _render_fn(self, state, cameras=None):
        env = self.env
        cams = env.cameras if cameras is None else cameras
        model = env.agent.model
        w = state.world

        def per_env(world):
            link_pos, link_quat = forward_kinematics(
                model, world.qpos, world.root_pos, world.root_quat)
            slots = self._slots_single(link_pos, link_quat,
                                       world.a_pos, world.a_quat,
                                       world.a_scale)
            return repose_scene(self.scene, slots)

        # barrier: without it XLA rematerializes the slot-gather repose into
        # every lax.map render iteration (once per camera!) to avoid
        # materializing the (B, N, ...) posed buffers — measured +19 ms/frame
        # at B=16 (51.3 -> 32 ms/frame with the barrier)
        posed = jax.lax.optimization_barrier(jax.vmap(per_env)(w))

        ext = env.camera_extrinsics_cv(state, cams)           # (B, C, 4, 4)
        want_seg = (cameras is None
                    and "segmentation" in getattr(env, "obs_mode", ""))

        # per-object color DR (task["obj_color"], real_xarm_env.py:175-176)
        # -> per-env per-slot tint stack; gathered per gaussian at render
        tint_slots = None
        task = state.task if isinstance(state.task, dict) else {}
        if "obj_color" in task and len(self.gs_objects):
            S = self.layout.num_slots
            B = self.num_envs
            tint_slots = jnp.ones((B, S, 3))
            tint_slots = tint_slots.at[:, jnp.asarray(self.obj_slot)].set(
                task["obj_color"][:, jnp.asarray(self.obj_actor_idx)])

        # optional: all frames (envs x cameras) through ONE pallas grid
        # (batch_frames=True); segmentation rides the same kernel.
        same_size = len({(c.width, c.height) for c in cams}) == 1
        if same_size and self.batch_frames and tint_slots is None \
                and self.raster_config.backend != "xla" \
                and jax.default_backend() not in ("cpu",):
            from gsworld_tpu.render.project import project_gaussians
            from gsworld_tpu.render.rasterize_pallas import (
                composite_tiles_pallas,
            )
            cfg = dataclasses.replace(self.raster_config,
                                      width=cams[0].width,
                                      height=cams[0].height)
            B = self.num_envs
            C = len(cams)

            def cam_of(e, ci):
                cam = cams[ci]
                return cam_maniskill2gs(
                    e[ci], jnp.asarray(cam.intrinsic), cam.width, cam.height,
                    jnp.asarray(self.rigid_sim2real),
                    jnp.float32(self.scale_sim2real))

            gs_cams = [jax.vmap(lambda e, ci=ci: cam_of(e, ci))(ext)
                       for ci in range(C)]
            gs_cams = jax.tree.map(lambda *xs: jnp.stack(xs, axis=1),
                                   *gs_cams)               # (B, C, ...)
            proj = jax.vmap(
                lambda p_env, cams_env: jax.vmap(
                    lambda cc: project_gaussians(p_env, cc, cfg,
                                                 self.scene.sh0,
                                                 self.scene.shN))(cams_env)
            )(posed, gs_cams)                              # (B, C, N, ...)
            proj = jax.tree.map(
                lambda x: x.reshape((B * C,) + x.shape[2:]), proj)
            sem = self.scene.semantics if want_seg else None
            from gsworld_tpu.render.binning import bin_entries_fused
            from gsworld_tpu.render.rasterize_pallas import (
                pack_record_columns,
            )
            # natively frame-batched (emit kernel folds frames into its
            # grid — pallas_call is not vmappable on TPU); the closed loop
            # never differentiates, so gid stays out of the entry sort
            bins = bin_entries_fused(proj, cfg,
                                     pack_record_columns(proj, sem),
                                     carry_gid=False)
            outs = composite_tiles_pallas(proj, bins, cfg, semantics=sem)
            imgs = jnp.clip(outs[0] * 255.0, 0, 255).astype(jnp.uint8)
            imgs = imgs.reshape(B, C, cams[0].height, cams[0].width, 3)
            if want_seg:
                segs = outs[2].astype(jnp.int16).reshape(
                    B, C, cams[0].height, cams[0].width)
                return {cam.name: {"rgb": imgs[:, ci],
                                   "segmentation": segs[:, ci, :, :, None]}
                        for ci, cam in enumerate(cams)}
            return {cam.name: {"rgb": imgs[:, ci]}
                    for ci, cam in enumerate(cams)}

        # general path: lax.map over envs (heterogeneous cameras /
        # segmentation / CPU-XLA backends)

        def render_env(args):
            posed_e, ext_e, tint_e = args
            tint = (tint_e[self.scene.slot_ids]
                    if tint_slots is not None else None)
            outs, segs = [], []
            for ci, cam in enumerate(cams):
                gs_cam = cam_maniskill2gs(
                    ext_e[ci], jnp.asarray(cam.intrinsic), cam.width,
                    cam.height, jnp.asarray(self.rigid_sim2real),
                    jnp.float32(self.scale_sim2real))
                cfg = dataclasses.replace(
                    self.raster_config, width=cam.width, height=cam.height)
                if want_seg:
                    img, seg = gs_render(posed_e, gs_cam, cfg, self.scene.sh0,
                                         self.scene.shN,
                                         semantics=self.scene.semantics,
                                         color_tint=tint)
                    segs.append(seg.astype(jnp.int16))
                else:
                    img = gs_render(posed_e, gs_cam, cfg, self.scene.sh0,
                                    self.scene.shN, color_tint=tint)
                outs.append(jnp.clip(img * 255.0, 0, 255).astype(jnp.uint8))
            if want_seg:
                return jnp.stack(outs), jnp.stack(segs)
            return jnp.stack(outs)

        zero_tint = (tint_slots if tint_slots is not None
                     else jnp.zeros((self.num_envs, 1, 3)))

        # lax.scan with unroll: XLA pipelines the unrolled per-env render
        # programs (overlapping sort/compositor stages of different envs),
        # which a rolled loop cannot — measured 3.0 ms/frame at B=4
        # (unrolled) vs 10.9 ms/frame at B=16 (rolled lax.map)
        unroll = min(4, self.num_envs)

        def scan_body(carry, xs):
            return carry, render_env(xs)

        _, out = jax.lax.scan(scan_body, (), (posed, ext, zero_tint),
                              unroll=unroll)
        if want_seg:
            imgs, segs = out
            return {cam.name: {"rgb": imgs[:, ci],
                               "segmentation": segs[:, ci, :, :, None]}
                    for ci, cam in enumerate(cams)}
        imgs = out
        return {cam.name: {"rgb": imgs[:, ci]}
                for ci, cam in enumerate(cams)}

    def _step_and_render(self, state, action):
        state, obs, reward, terminated, truncated, info = self.env._step_fn(
            state, action)
        obs = dict(obs)
        obs["sensor_data"] = self._render_fn(state)
        return state, obs, reward, terminated, truncated, info

    def _reset_and_render(self, keys):
        state, obs = self.env._reset_fn(keys)
        obs = dict(obs)
        obs["sensor_data"] = self._render_fn(state)
        return state, obs

    # ------------------------------------------------------------------ #
    # gym facade (matches reference wrapper usage)
    # ------------------------------------------------------------------ #

    def reset(self, seed: Optional[int] = None, options: Optional[dict] = None):
        seed = 0 if seed is None else seed
        keys = jax.random.split(jax.random.PRNGKey(seed), self.num_envs)
        self.env._state, obs = self._jit_reset(keys)
        return obs, {}

    def step(self, action):
        action = jnp.asarray(action, jnp.float32)
        if action.ndim == 1:
            action = jnp.broadcast_to(action,
                                      (self.num_envs,) + action.shape)
        (self.env._state, obs, reward, terminated, truncated,
         info) = self._jit_step(self.env._state, action)
        if self.log_state:
            self.save_state_log()
        return obs, reward, terminated, truncated, info

    def save_state_log(self):
        """Persist the current env state as a restorable bundle
        (the reference's commented env.save_state_log(),
        gsworld_rand_action_tabletop.py:134)."""
        from gsworld_tpu.utils.checkpoint import save_env_state
        path = f"{self.state_log_path}/state_{self._state_log_count:06d}.npz"
        self._state_log_count += 1
        return save_env_state(self.env._state, path)

    def render_current_step(self):
        """Render without stepping (gs_world_wrapper.py:204-230)."""
        return self._jit_render(self.env._state)

    def render(self):
        """Human render view (GS render of the third-person camera;
        reference GSWorldWrapper.render returns the raster human view,
        gs_world_wrapper.py:200-202)."""
        if not hasattr(self, "_jit_render_human"):
            cams = self.env.human_render_cameras
            self._jit_render_human = jax.jit(
                lambda s: self._render_fn(s, cameras=cams))
        out = self._jit_render_human(self.env._state)
        return next(iter(out.values()))["rgb"]

    def __getattr__(self, name):
        return getattr(self.env, name)
