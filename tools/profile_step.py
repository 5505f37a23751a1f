#!/usr/bin/env python
"""Whole-step profiler (TPU): physics vs render vs full fused step at the
bench config — answers "where do the ~112 ms/batch-step go" above the
render-only view of profile_render.py / profile_binning.py.

Each phase is scanned REPS times inside ONE jitted program with the state
carried through (real data dependence, no hoisting), so the axon tunnel's
~30 ms dispatch latency amortizes away.

    python tools/profile_step.py [--envs 4]
"""

import argparse
import json
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


def bench_time(fn, state0, act):
    """Times fn(state, act) with a FRESH state per call (qpos perturbed on
    device): identical repeated executions can be served from backend
    result caches on this axon TPU setup (CLAUDE.md), which made the old
    fixed-input timings spuriously fast."""

    def perturb(i):
        w = state0.world._replace(qpos=state0.world.qpos + i * 1e-6)
        return state0._replace(world=w)

    jax.block_until_ready(fn(perturb(0), act))
    best = np.inf
    for i in range(1, 4):
        st = jax.block_until_ready(perturb(i))
        t0 = time.perf_counter()
        jax.block_until_ready(fn(st, act))
        best = min(best, time.perf_counter() - t0)
    return best * 1e3 / REPS


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--envs", type=int, default=4)
    args = p.parse_args()

    from gsworld_tpu.rollout.random_actions import build

    env, wrapper = build(
        "AlignFr3Env-v1", num_envs=args.envs, cfg_name="fr3_align",
        sim_freq=120, control_freq=40, width=640, height=480,
        max_per_tile=1024, tile_chunk=16, max_tiles_per_gaussian=64,
        tile=32, max_entries=1 << 19, synthetic_scale=1.0,
        obs_mode="rgb+segmentation")
    B = args.envs
    wrapper.reset(seed=0)
    state0 = env._state
    act = jnp.zeros((B, env.action_dim), jnp.float32)

    def chain(step_fn, extract):
        """Scan step_fn REPS times, carrying state; extract keeps the
        output alive."""

        @jax.jit
        def run(state, action):
            def body(carry, _):
                st = carry
                st, out = step_fn(st, action)
                return st, None
            st, _ = jax.lax.scan(body, state, None, length=REPS)
            return extract(st)

        return run

    # 1. physics + task step only (no render)
    def phys_step(st, a):
        st, obs, r, te, tr, info = env._step_fn(st, a)
        return st, r

    t_phys = bench_time(chain(phys_step, lambda st: st.world.qpos), state0, act)
    print(f"physics+obs step        {t_phys:8.2f} ms/ctrl-step", flush=True)

    # keep EVERY rendered output live (both cameras, rgb AND segmentation):
    # dropping any of them lets XLA dead-code-eliminate that camera's render
    # while ms_per_frame still divides by all cameras (ADVICE r3)
    def live_sum(sensor_data):
        tot = jnp.float32(0)
        for cam in sensor_data.values():
            for arr in cam.values():
                tot = tot + jnp.sum(arr.astype(jnp.float32))
        return tot

    # 2. full fused step + render (the production program)
    def full_step(st, a):
        st, obs, r, te, tr, info = wrapper._step_and_render(st, a)
        return st, live_sum(obs["sensor_data"])

    @jax.jit
    def run_full(state, action):
        def body(carry, _):
            st, acc = carry
            st, tot = full_step(st, action)
            return (st, acc + tot), None
        (st, acc), _ = jax.lax.scan(
            body, (state, jnp.float32(0)), None, length=REPS)
        return acc

    t_full = bench_time(run_full, state0, act)
    print(f"full step+render        {t_full:8.2f} ms/ctrl-step", flush=True)

    # 3. render alone (state fixed; perturb via qpos noise each rep)
    @jax.jit
    def run_render(state, action):
        def body(carry, _):
            st, acc = carry
            w = st.world._replace(qpos=st.world.qpos + 1e-6)
            st = st._replace(world=w)
            sd = wrapper._render_fn(st)
            return (st, acc + live_sum(sd)), None
        (st, acc), _ = jax.lax.scan(body, (state, jnp.float32(0)), None,
                                    length=REPS)
        return acc

    t_render = bench_time(run_render, state0, act)
    nframes = B * len(env.cameras)
    print(f"render alone            {t_render:8.2f} ms/ctrl-step "
          f"({t_render / nframes:.2f} ms/frame x {nframes})", flush=True)

    print(json.dumps({
        "envs": B,
        "physics_ms": round(t_phys, 2),
        "render_ms": round(t_render, 2),
        "full_ms": round(t_full, 2),
        "ms_per_frame": round(t_render / nframes, 2),
    }))


if __name__ == "__main__":
    main()
