#!/usr/bin/env python
"""Prefix profiler for bin_entries_fused: true incremental stage costs.

profile_render.py times sub-stages in isolation, which misses XLA glue
(layout changes, fusion boundaries) — its stage times summed to ~3 ms
while the fused total measured 7.7.  This tool times PREFIXES of the
real pipeline (_stop_after=k) and reports differences, so every ms of
the total is attributed.

    python tools/profile_binning.py [--frames 1] [--tile 32] [--log2e 18]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=1)
    p.add_argument("--tile", type=int, default=32)
    p.add_argument("--log2e", type=int, default=18)
    p.add_argument("--reps", type=int, default=8)
    args = p.parse_args()

    import dataclasses

    from gsworld_tpu.render.binning import bin_entries_fused
    from gsworld_tpu.render.project import project_gaussians
    from gsworld_tpu.render.rasterize_pallas import (
        composite_tiles_pallas,
        pack_record_columns,
    )
    from gsworld_tpu.rollout.random_actions import build
    from tools.tpu_timeit import stage_time, tunnel_floor

    env, wrapper = build(
        "AlignFr3Env-v1", num_envs=1, cfg_name="fr3_align",
        sim_freq=120, control_freq=40, width=640, height=480,
        max_per_tile=1024, tile_chunk=16,
        tile=args.tile, max_entries=1 << args.log2e, synthetic_scale=1.0)
    cfg = wrapper.raster_config
    scene = wrapper.scene
    F = args.frames
    print(f"N={scene.means.shape[0]} tiles={cfg.num_tiles} "
          f"E=2^{args.log2e} tile={cfg.tile} frames={F}")

    obs, _ = wrapper.reset(seed=0)
    state = wrapper.env._state

    from gsworld_tpu.gs.transform import repose_scene
    from gsworld_tpu.physics.kinematics import forward_kinematics
    from gsworld_tpu.render.camera import cam_maniskill2gs

    model = env.agent.model

    def get_posed(state):
        w = jax.tree.map(lambda x: x[0], state.world)
        lp, lq = forward_kinematics(model, w.qpos, w.root_pos, w.root_quat)
        slots = wrapper._slots_single(lp, lq, w.a_pos, w.a_quat)
        return repose_scene(scene, slots)

    posed = jax.jit(get_posed)(state)
    ext = env.camera_extrinsics_cv(state, env.cameras)
    cam = cam_maniskill2gs(ext[0, 0], jnp.asarray(env.cameras[0].intrinsic),
                           640, 480, jnp.asarray(wrapper.rigid_sim2real),
                           jnp.float32(wrapper.scale_sim2real))
    cam = jax.tree.map(jnp.asarray, cam)
    proj1 = jax.jit(lambda p: project_gaussians(p, cam, cfg, scene.sh0,
                                                scene.shN))(posed)
    # F frames: replicate with per-frame jitter so sorts see distinct data
    key = jax.random.PRNGKey(0)
    jit_j = jax.random.normal(key, (F, 1)) * 1e-3
    projF = jax.tree.map(
        lambda x: jnp.broadcast_to(x[None], (F,) + x.shape).copy(), proj1)
    projF = projF._replace(
        depth=projF.depth + jit_j,
        mean2d=projF.mean2d + jit_j[..., None])
    if F == 1:
        projF = jax.tree.map(lambda x: x[0], projF)

    ebins = jax.jit(lambda p: bin_entries_fused(
        p, cfg, pack_record_columns(p, None)))(projF)
    st = ebins.starts if F == 1 else ebins.starts[0]
    tot = int(np.asarray(st)[-1])
    print(f"entries/frame={tot} ({tot / cfg.max_entries:.0%} of E) "
          f"overflow={int(np.sum(np.asarray(ebins.overflow)))}")
    print(f"tunnel floor: {tunnel_floor():.2f} ms")

    def p_proj(eps, p):
        return p._replace(depth=p.depth + eps, mean2d=p.mean2d + eps)

    times = {}

    def run(label, fn):
        times[label] = stage_time(fn, lambda: (projF,), label,
                                  reps=args.reps)

    run("P1 depth sort", lambda e, p: bin_entries_fused(
        p_proj(e, p), cfg, pack_record_columns(p_proj(e, p), None),
        _stop_after=1))
    run("P2 +budget/meta/r0", lambda e, p: bin_entries_fused(
        p_proj(e, p), cfg, pack_record_columns(p_proj(e, p), None),
        _stop_after=2))
    run("P3 +emit kernel", lambda e, p: bin_entries_fused(
        p_proj(e, p), cfg, pack_record_columns(p_proj(e, p), None),
        _stop_after=3))
    run("P4 +entry sort", lambda e, p: bin_entries_fused(
        p_proj(e, p), cfg, pack_record_columns(p_proj(e, p), None),
        _stop_after=4))
    run("P5 full binning", lambda e, p: bin_entries_fused(
        p_proj(e, p), cfg, pack_record_columns(p_proj(e, p), None)))
    run("P6 +compositor", lambda e, p: composite_tiles_pallas(
        p_proj(e, p),
        bin_entries_fused(p_proj(e, p), cfg,
                          pack_record_columns(p_proj(e, p), None)),
        cfg))
    run("P6s +compositor(seg)", lambda e, p: composite_tiles_pallas(
        p_proj(e, p),
        bin_entries_fused(p_proj(e, p), cfg,
                          pack_record_columns(p_proj(e, p), scene.semantics)),
        cfg, semantics=scene.semantics))

    labels = list(times)
    print("\nincrements (per frame):")
    prev = 0.0
    for lb in labels[:6]:
        print(f"  {lb:24s} {times[lb]:7.2f} ms  (+{(times[lb] - prev) / F:.2f})")
        prev = times[lb]
    print(f"  seg delta: {(times['P6s +compositor(seg)'] - times['P6 +compositor']) / F:+.2f} ms")


if __name__ == "__main__":
    main()
