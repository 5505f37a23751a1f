#!/usr/bin/env python
"""Stage-by-stage render profiler (TPU): where does the ms/frame go?

The axon tunnel adds ~30 ms dispatch latency per call, so each stage is
scanned REPS times inside ONE jitted program with a loop-carried input
perturbation (prevents hoisting/DCE); reported time = (total - floor)/REPS.

Run on the real chip:  python tools/profile_render.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

REPS = 8
_floor = [0.0]


def scan_time(stage, args, label):
    """stage(eps, *args) -> pytree; scanned REPS times inside one jit.
    eps (f32 scalar, runtime-zero) must perturb the stage's REAL inputs."""

    def scanned(args):
        def body(carry, _):
            out = stage(carry * 1e-30, *args)
            leaves = jax.tree.leaves(out)
            s = sum(jnp.sum(jnp.ravel(l)[:64].astype(jnp.float32))
                    for l in leaves)
            return carry + s * 1e-12, None

        tot, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=REPS)
        return tot

    fn = jax.jit(scanned)
    out = fn(args)
    jax.block_until_ready(out)
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(args))
        best = min(best, time.perf_counter() - t0)
    ms = max(best * 1e3 - _floor[0], 0.0) / REPS
    print(f"{label:26s}{ms:8.2f} ms", flush=True)
    return ms


def main():
    from gsworld_tpu.render.binning import (
        _two_level_searchsorted,
        bin_entries,
    )
    from gsworld_tpu.render.project import project_gaussians
    from gsworld_tpu.render.rasterize_pallas import (
        _prep_entry_records,
        composite_tiles_pallas,
        pack_records,
    )
    from gsworld_tpu.rollout.random_actions import build

    env, wrapper = build(
        "AlignFr3Env-v1", num_envs=1, cfg_name="fr3_align",
        sim_freq=120, control_freq=40, width=640, height=480,
        max_per_tile=1024, tile_chunk=16, synthetic_scale=1.0)
    cfg = wrapper.raster_config
    scene = wrapper.scene
    print(f"N gaussians: {scene.means.shape[0]}, tiles: {cfg.num_tiles}, "
          f"E={cfg.max_entries}, D={cfg.max_tiles_per_gaussian}")

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

    # dispatch floor
    def scanned_triv(x):
        def body(c, _):
            return c + jnp.sum(x * (1.0 + c * 1e-30)) * 1e-12, None
        t, _ = jax.lax.scan(body, jnp.float32(0), None, length=REPS)
        return t

    ftriv = jax.jit(scanned_triv)
    x = jnp.ones((8, 128))
    jax.block_until_ready(ftriv(x))
    best = np.inf
    for _ in range(5):
        t0 = time.perf_counter()
        jax.block_until_ready(ftriv(x))
        best = min(best, time.perf_counter() - t0)
    _floor[0] = best * 1e3
    print(f"dispatch floor: {_floor[0]:.2f} ms", flush=True)

    proj = jax.jit(lambda p: project_gaussians(p, cam, cfg, scene.sh0,
                                               scene.shN))(posed)
    ebins = jax.jit(lambda p: bin_entries(p, cfg))(proj)
    nvis = int(jnp.sum(proj.radius > 0))
    total = int(ebins.starts[-1])
    counts = np.diff(np.asarray(ebins.starts))
    print(f"visible: {nvis}, entries: {total}, overflow {int(ebins.overflow)}"
          f", counts mean {counts.mean():.0f} max {counts.max()}", flush=True)

    def p_posed(eps, p):
        return p._replace(means=p.means + eps)

    def p_proj(eps, p):
        return p._replace(mean2d=p.mean2d + eps,
                          depth=p.depth + eps)

    # ---- stages ----
    scan_time(lambda e, p: project_gaussians(p_posed(e, p), cam, cfg,
                                             scene.sh0, scene.shN),
              (posed,), "project")
    scan_time(lambda e, p: bin_entries(p_proj(e, p), cfg),
              (proj,), "bin_entries total")
    scan_time(lambda e, p: jnp.argsort(p_proj(e, p).depth),
              (proj,), "  depth argsort")

    n = proj.depth.shape[0]
    D, T, gx, E = (cfg.max_tiles_per_gaussian, cfg.num_tiles, cfg.tiles_x,
                   cfg.max_entries)
    order = jnp.argsort(proj.depth).astype(jnp.int32)
    rect_o = proj.rect[order]
    w = rect_o[:, 2] - rect_o[:, 0]
    area = w * (rect_o[:, 3] - rect_o[:, 1])
    cnt = jnp.clip(area, 0, D)
    offs = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                            jnp.cumsum(cnt)[:-1].astype(jnp.int32)])
    rank = jnp.arange(n, dtype=jnp.int32)

    def markers_fill(eps, offs, cnt):
        offs = offs + eps.astype(jnp.int32)
        mark_pos = jnp.where(cnt > 0, offs, E)
        markers = jnp.full((E,), -1, jnp.int32).at[mark_pos].max(
            rank, mode="drop")
        return jax.lax.associative_scan(jnp.maximum, markers)

    scan_time(markers_fill, (offs, cnt), "  scatter+cummax")

    g_rank = markers_fill(jnp.float32(0), offs, cnt)
    meta = jnp.stack([rect_o[:, 0], rect_o[:, 1],
                      jnp.maximum(w, 1), offs, order], axis=1)

    def tiles_of(eps, meta, g_rank):
        g_rank = g_rank + eps.astype(jnp.int32)
        m = meta[jnp.maximum(g_rank, 0)]
        d = jnp.arange(E, dtype=jnp.int32) - m[:, 3]
        dy = d // m[:, 2]
        tile = (m[:, 1] + dy) * gx + m[:, 0] + (d - dy * m[:, 2])
        return tile

    scan_time(tiles_of, (meta, g_rank), "  meta gather+tiles")

    e2 = 1
    while e2 < E:
        e2 *= 2
    tile_ids = tiles_of(jnp.float32(0), meta, g_rank)
    key = tile_ids * e2 + jnp.arange(E, dtype=jnp.int32)
    scan_time(lambda e, k: jax.lax.sort(k + e.astype(jnp.int32)),
              (key,), f"  1-key sort {E//1024}k")
    key_s = jax.lax.sort(key)
    scan_time(lambda e, ks: _two_level_searchsorted(
        ks + e.astype(jnp.int32), jnp.arange(T + 1, dtype=jnp.int32) * e2),
        (key_s,), "  searchsorted")

    scan_time(lambda e, p, b: _prep_entry_records(p_proj(e, p), b, None),
              (proj, ebins), "record prep")
    scan_time(lambda e, p: pack_records(p_proj(e, p)), (proj,), "  pack only")

    scan_time(lambda e, p, b: composite_tiles_pallas(p_proj(e, p), b, cfg),
              (proj, ebins), "pallas composite")
    scan_time(lambda e, p, b: composite_tiles_pallas(p_proj(e, p), b, cfg,
                                                     semantics=scene.semantics),
              (proj, ebins), "pallas composite+seg")

    # kernel only (records fixed)
    recs = jax.jit(
        lambda p, b: _prep_entry_records(p, b, None))(proj, ebins)

    import functools

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from gsworld_tpu.render.rasterize_pallas import (
        CHUNK,
        REC_W,
        _segment_kernel,
    )
    tpb = 4
    n_px = cfg.tile * cfg.tile

    def kern(eps, recs, starts):
        r = (recs * (1.0 + eps))[None]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1, T // tpb),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((1, tpb, 5, n_px),
                                   lambda f, t, s: (f, t, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, REC_W, CHUNK), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )
        return pl.pallas_call(
            functools.partial(_segment_kernel, cfg=cfg, n_px=n_px,
                              tiles_per_program=tpb, with_seg=False),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((1, T, 5, n_px), jnp.float32),
        )(starts[None], r)

    scan_time(kern, (recs, ebins.starts), "  kernel only")

    def full(eps, p):
        pr = project_gaussians(p_posed(eps, p), cam, cfg, scene.sh0,
                               scene.shN)
        return composite_tiles_pallas(pr, bin_entries(pr, cfg), cfg)

    scan_time(full, (posed,), "FULL frame")

    def full_seg(eps, p):
        pr = project_gaussians(p_posed(eps, p), cam, cfg, scene.sh0,
                               scene.shN)
        return composite_tiles_pallas(pr, bin_entries(pr, cfg), cfg,
                                      semantics=scene.semantics)

    scan_time(full_seg, (posed,), "FULL frame + seg")


if __name__ == "__main__":
    main()
