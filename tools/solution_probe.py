#!/usr/bin/env python
"""Run one scripted solve (any SOLUTIONS env) and print the evaluate() components after
every phase plus at the end — pinpoints which predicate blocks success.

    python tools/solution_probe.py [--seed 0] [--env AlignFr3Env-v1]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--env", default="AlignFr3Env-v1")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--watch", default=None,
                   help="actor name: print its state at every env step "
                        "where |v| > --vmin")
    p.add_argument("--vmin", type=float, default=0.05)
    args = p.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from gsworld_tpu import envs
    from gsworld_tpu.rollout.planner import solutions as S

    env = envs.make(args.env, num_envs=1, obs_mode="state_dict",
                    control_mode="pd_joint_pos",
                    sim_config=dict(sim_freq=100, control_freq=20))

    if args.watch:
        base = env
        while hasattr(base, "env"):
            base = base.env
        wi = base.actor_index[args.watch]
        orig_step = env.step

        def step_watch(action):
            out = orig_step(action)
            w = base.state.world
            p = np.asarray(w.a_pos[0, wi])
            v = np.asarray(w.a_lin[0, wi])
            om = np.asarray(w.a_ang[0, wi])
            el = int(base.state.elapsed[0])
            if np.linalg.norm(v) > args.vmin:
                print(f"    step el={el:3d} p={np.round(p, 3)} "
                      f"v={np.round(v, 3)} w={np.round(om, 2)}", flush=True)
            return out

        env.step = step_watch

    def report(tag, planner=None):
        base = env
        while hasattr(base, "env"):
            base = base.env
        info = jax.tree.map(
            lambda x: np.asarray(x)[0], base._info(base.state))
        el = int(base.state.elapsed[0])
        names = [k for k in info if k != "success"]
        parts = " ".join(f"{k}={bool(info[k])}" for k in sorted(names))
        pos = {n: np.round(np.asarray(
            base.state.world.a_pos[0, i]), 3).tolist()
            for n, i in base.actor_index.items()}
        print(f"[{tag:14s}] el={el:3d} success={bool(info['success'])} "
              f"{parts}", flush=True)
        print(f"    actors: {pos}", flush=True)

    orig_trace = S._trace

    def verbose_trace(e, planner, tag, obj_name):
        orig_trace(e, planner, tag, obj_name)
        report(f"{tag}:{obj_name[:12]}")

    S._trace = verbose_trace
    solve = S.SOLUTIONS[args.env]
    res = solve(env, seed=args.seed)
    print(f"solve returned {res}", flush=True)
    report("final")


if __name__ == "__main__":
    main()
