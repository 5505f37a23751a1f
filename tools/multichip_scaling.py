#!/usr/bin/env python
"""Env-axis scaling sweep over a device mesh (VERDICT r1 next #7).

On a real pod this measures ICI-sharded closed-loop throughput; in this
container it runs on N virtual CPU devices, which validates the sharded
program SHAPE (compilation, partitioning, collectives) and the
sharded-vs-single-device numerical equivalence — wall-clock scaling is
meaningless with one physical core and is labeled as such.

    python tools/multichip_scaling.py [--devices 8] [--envs-per-dev 1]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--devices", type=int, default=8)
    p.add_argument("--envs_per_dev", type=int, default=1)
    p.add_argument("--ep_len", type=int, default=3)
    p.add_argument("--width", type=int, default=64)
    p.add_argument("--height", type=int, default=48)
    p.add_argument("--synthetic_scale", type=float, default=0.05)
    args = p.parse_args()

    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={args.devices}"
        ).strip()

    import jax

    # force the virtual CPU mesh BEFORE any backend init (jax.devices()
    # would latch the single-chip axon backend); opt into real devices
    # with GSWORLD_REAL_DEVICES=1 on an actual pod
    if os.environ.get("GSWORLD_REAL_DEVICES", "0") != "1":
        jax.config.update("jax_platforms", "cpu")
    on_cpu = jax.default_backend() == "cpu"

    from gsworld_tpu.dist.mesh import env_mesh, shard_env_axis
    from gsworld_tpu.rollout.random_actions import build, rollout_fps

    rows = []
    for n_dev in (1, 2, args.devices):
        if n_dev > len(jax.devices()):
            continue
        B = n_dev * args.envs_per_dev
        env, wrapper = build(
            "AlignFr3Env-v1", num_envs=B, cfg_name="fr3_align",
            sim_freq=120, control_freq=40, width=args.width,
            height=args.height, max_per_tile=128, tile_chunk=4,
            synthetic_scale=args.synthetic_scale)
        obs, _ = wrapper.reset(seed=0)
        mesh = env_mesh(jax.devices()[:n_dev])
        env._state = shard_env_axis(env.state, mesh)
        import jax.numpy as jnp
        a = shard_env_axis(jnp.zeros((B, env.action_dim)), mesh)
        t0 = time.time()
        _, obs2, *_ = wrapper._jit_step(env.state, a)
        rgb = obs2["sensor_data"][env.cameras[0].name]["rgb"]
        jax.block_until_ready(rgb)
        compile_s = time.time() - t0
        # verify per-device placement
        n_shards = len(rgb.sharding.device_set)
        fps, spf, _ = rollout_fps(wrapper, args.ep_len, seed=0,
                                  use_scan=True, shard=True)
        rows.append((n_dev, B, n_shards, fps, compile_s))
        print(f"devices={n_dev} envs={B} shards={n_shards} "
              f"steps/s={fps:.2f} (compile {compile_s:.0f}s)", flush=True)

    label = ("virtual CPU devices, one physical core — shape/correctness "
             "only" if on_cpu else "real devices")
    print(f"\n| devices | envs | env-steps/s | note |")
    print("|---|---|---|---|")
    for n_dev, B, n_shards, fps, _ in rows:
        print(f"| {n_dev} | {B} | {fps:.2f} | {label} |")


if __name__ == "__main__":
    main()
