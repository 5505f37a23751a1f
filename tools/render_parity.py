#!/usr/bin/env python
"""Bench-scale render-parity fixture (TPU): PSNR of the production Pallas
render vs an uncapped XLA reference render on the bench scene
(640x480, ~220k gaussians, both real cameras).

The committed numbers live in PARITY.md ("Render fidelity"); the CPU
regression guard at mid scale is tests/test_render.py::test_pallas_vs_xla_midscale.

Run on the real chip:  python tools/render_parity.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from gsworld_tpu.gs.transform import repose_scene
from gsworld_tpu.physics.kinematics import forward_kinematics
from gsworld_tpu.render.binning import bin_entries_fused, bin_gaussians
from gsworld_tpu.render.camera import RasterConfig, cam_maniskill2gs
from gsworld_tpu.render.project import project_gaussians
from gsworld_tpu.render.rasterize import composite_tiles
from gsworld_tpu.render.rasterize_pallas import (
    composite_tiles_pallas,
    pack_record_columns,
)
from gsworld_tpu.rollout.random_actions import build


def psnr(a, b):
    mse = float(np.mean((np.asarray(a) - np.asarray(b)) ** 2))
    return 10 * np.log10(1.0 / max(mse, 1e-12))


def main():
    env, wrapper = build("AlignFr3Env-v1", num_envs=1, cfg_name="fr3_align",
                         sim_freq=120, control_freq=40, width=640, height=480,
                         max_per_tile=1024, tile_chunk=16,
                         synthetic_scale=1.0)
    wrapper.reset(seed=0)
    state = env._state

    def one_world(w):
        model = env.agent.model
        lp, lq = forward_kinematics(model, w.qpos, w.root_pos, w.root_quat)
        slots = wrapper._slots_single(lp, lq, w.a_pos, w.a_quat, w.a_scale)
        return repose_scene(wrapper.scene, slots)

    posed = jax.jit(jax.vmap(one_world))(state.world)
    posed0 = jax.tree.map(lambda x: x[0], posed)
    cams = env.cameras
    ext = env.camera_extrinsics_cv(state, cams)
    print(f"N gaussians: {wrapper.scene.means.shape[0]}")

    results = {}
    for ci, cam in enumerate(cams):
        gs_cam = cam_maniskill2gs(ext[0, ci], jnp.asarray(cam.intrinsic),
                                  cam.width, cam.height,
                                  jnp.asarray(wrapper.rigid_sim2real),
                                  jnp.float32(wrapper.scale_sim2real))
        # reference: XLA compositor with very generous caps (tile 16)
        ref_cfg = RasterConfig(width=640, height=480, tile=16,
                               max_per_tile=4096, max_tiles_per_gaussian=64,
                               tile_chunk=8, backend="xla")
        proj_ref = jax.jit(lambda p: project_gaussians(
            p, gs_cam, ref_cfg, wrapper.scene.sh0, wrapper.scene.shN))(posed0)
        bins_ref = jax.jit(lambda p: bin_gaussians(p, ref_cfg))(proj_ref)
        ref_img, _ = jax.jit(lambda p, b: composite_tiles(p, b, ref_cfg))(
            proj_ref, bins_ref)
        ref_img = np.asarray(ref_img)
        print(f"cam {ci} ({cam.name}): ref overflow {int(bins_ref.overflow)}")

        cfg = wrapper.raster_config
        proj = jax.jit(lambda p: project_gaussians(
            p, gs_cam, cfg, wrapper.scene.sh0, wrapper.scene.shN))(posed0)
        ebins = jax.jit(lambda p: bin_entries_fused(
            p, cfg, pack_record_columns(p, None)))(proj)
        img, _ = composite_tiles_pallas(proj, ebins, cfg)
        live = int(np.asarray(ebins.starts)[-1])
        db = psnr(img, ref_img)
        results[cam.name] = round(db, 2)
        print(f"cam {ci} ({cam.name}) tile={cfg.tile} "
              f"E=2^{cfg.max_entries.bit_length() - 1} "
              f"D={cfg.max_tiles_per_gaussian}: PSNR {db:6.2f} dB  "
              f"live {live} overflow {int(np.asarray(ebins.overflow))}")

    import json
    print(json.dumps({"psnr_vs_uncapped_xla_db": results}))


if __name__ == "__main__":
    main()
