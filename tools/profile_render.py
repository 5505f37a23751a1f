#!/usr/bin/env python
"""Stage-by-stage render profiler (TPU): where does the ms/frame go?

Profiles the PRODUCTION path (bin_entries_fused + pallas compositor, the
path wrapper/gs_env.py render uses) stage by stage, plus the legacy
bin_entries variant for comparison.

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
RESULTS = {}


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
    print(f"{label:28s}{ms:8.2f} ms", flush=True)
    RESULTS[label.strip()] = round(ms, 2)
    return ms


def main():
    from gsworld_tpu.render.binning import (
        _two_level_searchsorted,
        bin_entries,
        bin_entries_fused,
    )
    from gsworld_tpu.render.project import project_gaussians
    from gsworld_tpu.render.rasterize_pallas import (
        composite_tiles_pallas,
        emit_entries,
        pack_record_columns,
    )
    from gsworld_tpu.rollout.random_actions import build

    env, wrapper = build(
        "AlignFr3Env-v1", num_envs=1, cfg_name="fr3_align",
        sim_freq=120, control_freq=40, width=640, height=480,
        max_per_tile=1024, tile_chunk=16, synthetic_scale=1.0)
    cfg = wrapper.raster_config
    scene = wrapper.scene
    print(f"N gaussians: {scene.means.shape[0]}, tiles: {cfg.num_tiles}, "
          f"E={cfg.max_entries}, D={cfg.max_tiles_per_gaussian}, "
          f"tile={cfg.tile}")

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
    cols = pack_record_columns(proj, None)
    ebins = jax.jit(
        lambda p: bin_entries_fused(p, cfg, pack_record_columns(p, None))
    )(proj)
    nvis = int(jnp.sum(proj.radius > 0))
    total = int(ebins.starts[-1])
    counts = np.diff(np.asarray(ebins.starts))
    print(f"visible: {nvis}, entries: {total}, overflow {int(ebins.overflow)}"
          f", counts mean {counts.mean():.0f} max {counts.max()}", flush=True)
    RESULTS["_meta"] = dict(n=int(scene.means.shape[0]), nvis=nvis,
                            entries=total, E=cfg.max_entries,
                            tiles=cfg.num_tiles, tile=cfg.tile)

    def p_posed(eps, p):
        return p._replace(means=p.means + eps)

    def p_proj(eps, p):
        return p._replace(mean2d=p.mean2d + eps,
                          depth=p.depth + eps)

    # ---- production-path stages ----
    scan_time(lambda e, p: project_gaussians(p_posed(e, p), cam, cfg,
                                             scene.sh0, scene.shN),
              (posed,), "project")
    scan_time(lambda e, p: bin_entries_fused(
        p_proj(e, p), cfg, pack_record_columns(p_proj(e, p), None)),
        (proj,), "bin_entries_fused total")
    scan_time(lambda e, p: jnp.argsort(p_proj(e, p).depth),
              (proj,), "  depth argsort")

    # sub-stage: emit_entries with representative shapes
    n = proj.depth.shape[0]
    E = cfg.max_entries
    T = cfg.num_tiles
    npad = ((n + 127) // 128 + 1) * 128
    meta1 = jnp.zeros((1, 16, npad), jnp.float32).at[:, 3].set(
        jnp.linspace(0.0, float(E), npad)[None])
    r0s = jnp.minimum((jnp.arange(E // 128, dtype=jnp.int32) * 128
                       * npad) // E, npad - 129)[None]
    scan_time(lambda e, m, r: emit_entries(m + e, r, E, cfg.tiles_x, T),
              (meta1, r0s), "  emit_entries")

    # sub-stage: the 12-operand sort at E
    tile_ids = jnp.asarray(
        np.random.default_rng(0).integers(0, T + 1, size=E), jnp.int32)
    depth_e = jnp.asarray(np.random.default_rng(1).random(E), jnp.float32)
    paycols = tuple(jnp.zeros((E,), jnp.float32) for _ in range(10))

    def sortstage(e, t, d):
        out = jax.lax.sort((t + e.astype(jnp.int32), d) + paycols,
                           num_keys=2, is_stable=False)
        return out[0], out[2]

    scan_time(sortstage, (tile_ids, depth_e), "  12-operand sort")

    def sortstage3(e, t, d):
        out = jax.lax.sort((t + e.astype(jnp.int32), d,
                            jnp.zeros((E,), jnp.float32)),
                           num_keys=2, is_stable=False)
        return out[0], out[2]

    scan_time(sortstage3, (tile_ids, depth_e), "  3-operand sort")

    key_s = jax.lax.sort(tile_ids)
    scan_time(lambda e, ks: _two_level_searchsorted(
        ks + e.astype(jnp.int32), jnp.arange(T + 1, dtype=jnp.int32)),
        (key_s,), "  searchsorted")

    scan_time(lambda e, p, b: composite_tiles_pallas(p_proj(e, p), b, cfg),
              (proj, ebins), "pallas composite(payload)")
    scan_time(lambda e, p, b: composite_tiles_pallas(
        p_proj(e, p), b, cfg, semantics=scene.semantics),
        (proj, ebins), "pallas composite+seg")

    def full(eps, p):
        pr = project_gaussians(p_posed(eps, p), cam, cfg, scene.sh0,
                               scene.shN)
        b = bin_entries_fused(pr, cfg, pack_record_columns(pr, None))
        return composite_tiles_pallas(pr, b, cfg)

    scan_time(full, (posed,), "FULL frame (fused)")

    def full_seg(eps, p):
        pr = project_gaussians(p_posed(eps, p), cam, cfg, scene.sh0,
                               scene.shN)
        b = bin_entries_fused(pr, cfg,
                              pack_record_columns(pr, scene.semantics))
        return composite_tiles_pallas(pr, b, cfg,
                                      semantics=scene.semantics)

    scan_time(full_seg, (posed,), "FULL frame + seg (fused)")

    # legacy path for comparison
    def full_legacy(eps, p):
        pr = project_gaussians(p_posed(eps, p), cam, cfg, scene.sh0,
                               scene.shN)
        return composite_tiles_pallas(pr, bin_entries(pr, cfg), cfg)

    scan_time(full_legacy, (posed,), "FULL frame (legacy bin)")

    import json
    out_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tools", "profile_render_out.json")
    with open(out_path, "w") as f:
        json.dump(RESULTS, f, indent=1)
    print(f"wrote {out_path}", flush=True)


if __name__ == "__main__":
    main()
