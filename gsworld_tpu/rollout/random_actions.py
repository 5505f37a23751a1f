"""Random-action closed-loop rollout (the benchmark path).

CLI parity with examples/maniskill/gsworld_rand_action_tabletop.py:22-182:
build env (+GS wrapper), roll random actions for ``ep_len`` steps, measure
closed-loop FPS (env steps/sec including GS render across all envs), and
optionally dump per-camera videos/frames.

TPU-first: the whole episode can run as one ``lax.scan`` (``--scan``), so N
steps compile to a single XLA program with no host round-trips.
"""

from __future__ import annotations

import argparse
import json
import time
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp


def build(env_id: str, num_envs: int, cfg_name: str, sim_freq: int,
          control_freq: int, width: int, height: int, max_per_tile: int,
          tile_chunk: int, synthetic_scale: float = 1.0,
          obs_mode: str = "rgb", max_tiles_per_gaussian: int = 16,
          active_budget_frac: float = 1.0, tile: int = 16,
          max_entries: int = 1 << 19, batch_frames: bool = False,
          pack_records: bool = True):
    import dataclasses

    from gsworld_tpu import envs
    from gsworld_tpu.render.camera import RasterConfig
    from gsworld_tpu.wrapper.gs_env import GSWorldWrapper

    env = envs.make(env_id, num_envs=num_envs, obs_mode=obs_mode,
                    sim_config=dict(sim_freq=sim_freq,
                                    control_freq=control_freq))
    env.cameras = [dataclasses.replace(c, width=width, height=height)
                   for c in env.cameras]
    sizes = dict(
        n_background=int(120_000 * synthetic_scale),
        n_per_link=int(6_000 * synthetic_scale),
        n_per_object=int(6_000 * synthetic_scale))
    wrapper = GSWorldWrapper(
        env, cfg_name,
        raster_config=RasterConfig(width=width, height=height,
                                   max_per_tile=max_per_tile,
                                   max_tiles_per_gaussian=max_tiles_per_gaussian,
                                   active_budget_frac=active_budget_frac,
                                   tile_chunk=tile_chunk, tile=tile,
                                   max_entries=max_entries,
                                   pack_records=pack_records),
        synthetic_sizes=sizes, batch_frames=batch_frames)
    return env, wrapper


def rollout_fps(wrapper, ep_len: int, seed: int = 0, warmup: int = 2,
                use_scan: bool = False, shard: bool = False):
    """Run the closed loop and return (fps, per-step seconds).

    ``shard=True`` splits the env axis across all visible devices
    (dist.mesh env sharding over ICI); envs are embarrassingly parallel so
    XLA partitions the whole fused step+render program with no cross-chip
    collectives beyond the reduction that carries the timing dependency."""
    env = wrapper.env
    obs, _ = wrapper.reset(seed=seed)
    key = jax.random.PRNGKey(seed)

    if shard:
        from gsworld_tpu.dist.mesh import env_mesh, shard_env_axis
        mesh = env_mesh()
        env._state = shard_env_axis(env.state, mesh)

    if use_scan:
        # carry only env-0's last frame out of the scan (stacking every
        # frame would materialize ep_len*B*2 camera images in HBM); the
        # per-step rgb mean forces full computation of all renders
        def body(carry, k):
            state, = carry
            a = jax.random.uniform(k, (env.num_envs, env.action_dim),
                                   minval=-1, maxval=1)
            state, obs, *_ = wrapper._step_and_render(state, a)
            rgb = obs["sensor_data"][env.cameras[0].name]["rgb"]
            return (state,), (jnp.mean(rgb.astype(jnp.float32)), rgb[0])

        scan_fn = jax.jit(lambda s, ks: jax.lax.scan(body, (s,), ks))
        keys = jax.random.split(key, ep_len)
        (state,), (sums, frames) = scan_fn(env.state, keys)  # compile
        np.asarray(sums)
        # time with fresh inputs each call (identical repeated inputs can
        # be served from backend-side result caches) and a HOST-TRANSFER
        # barrier: block_until_ready can return before the remote axon
        # computation finishes (tools/tpu_timeit.py); np.asarray of the
        # per-step sums (ep_len floats) is a true sync at ~0 cost.
        best = np.inf
        st = state
        for rep in range(3):
            ks = jax.random.split(jax.random.fold_in(key, 100 + rep), ep_len)
            t0 = time.perf_counter()
            (st,), (sums, frames) = scan_fn(st, ks)
            np.asarray(sums)
            best = min(best, time.perf_counter() - t0)
        dt = best
        return ep_len * env.num_envs / dt, dt / ep_len, frames

    # eager loop (host in the loop, like the reference's python loop)
    for i in range(warmup):
        a = env.action_space_sample(jax.random.fold_in(key, 10_000 + i))
        obs, *_ = wrapper.step(a)
    np.asarray(obs["sensor_data"][env.cameras[0].name]["rgb"])
    t0 = time.perf_counter()
    last = None
    for i in range(ep_len):
        a = env.action_space_sample(jax.random.fold_in(key, i))
        obs, *_ = wrapper.step(a)
        last = obs
    # host-transfer barrier (block_until_ready can return early on axon)
    np.asarray(last["sensor_data"][env.cameras[0].name]["rgb"])
    dt = time.perf_counter() - t0
    return ep_len * env.num_envs / dt, dt / ep_len, None


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--env_id", "-e", default="AlignFr3Env-v1")
    p.add_argument("--cfg_name", default="fr3_align")
    p.add_argument("--num_envs", "-n", type=int, default=1)
    p.add_argument("--ep_len", type=int, default=10)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--sim_freq", type=int, default=120)
    p.add_argument("--control_freq", type=int, default=40)
    p.add_argument("--width", type=int, default=640)
    p.add_argument("--height", type=int, default=480)
    p.add_argument("--max_per_tile", type=int, default=1024)
    p.add_argument("--tile_chunk", type=int, default=40)
    p.add_argument("--synthetic_scale", type=float, default=1.0)
    p.add_argument("--scan", action="store_true")
    p.add_argument("--save_video_dir", default=None)
    args = p.parse_args(argv)

    env, wrapper = build(args.env_id, args.num_envs, args.cfg_name,
                         args.sim_freq, args.control_freq, args.width,
                         args.height, args.max_per_tile, args.tile_chunk,
                         args.synthetic_scale)
    fps, spf, frames = rollout_fps(wrapper, args.ep_len, args.seed,
                                   use_scan=args.scan)
    print(f"FPS: {fps:.2f} (env-steps/s incl. GS render, "
          f"{args.num_envs} envs, {spf*1000:.1f} ms/step)")
    if args.save_video_dir and frames is not None:
        from gsworld_tpu.rollout.io_utils import save_images_to_dir
        save_images_to_dir(np.asarray(frames[:, 0]), args.save_video_dir)
    return fps


if __name__ == "__main__":
    main()
