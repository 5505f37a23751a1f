#!/usr/bin/env python
"""Run every scripted solution over N seeds and emit the per-task success
table (reference stats: run_with_gs.py:142-163; VERDICT r1 weak #6).

Runs the raw env (no GS render) — the solutions drive physics + planner
only, which is what the success predicate tests. Use on TPU with the
compile cache, or CPU for a single task:

    python tools/solution_stats.py [--seeds 5] [--tasks AlignFr3Env-v1 ...]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--seeds", type=int, default=5)
    p.add_argument("--tasks", nargs="*", default=None)
    p.add_argument("--out", default=None)
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (axon latches the TPU)")
    args = p.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from gsworld_tpu import envs
    from gsworld_tpu.rollout.planner.solutions import SOLUTIONS

    tasks = args.tasks or list(SOLUTIONS.keys())
    rows = []
    for env_id in tasks:
        env = envs.make(env_id, num_envs=1, obs_mode="state_dict",
                        control_mode="pd_joint_pos",
                        sim_config=dict(sim_freq=100, control_freq=20))
        solve = SOLUTIONS[env_id]
        succ, failed_plan, lens = 0, 0, []
        t0 = time.time()
        for seed in range(args.seeds):
            try:
                res = solve(env, seed=seed)
            except Exception as e:  # noqa: BLE001
                print(f"  {env_id} seed {seed}: EXC {e}", flush=True)
                failed_plan += 1
                continue
            if res == -1:
                failed_plan += 1
                continue
            info = env._info(env.state)
            ok = bool(info["success"][0])
            succ += int(ok)
            lens.append(int(env.state.elapsed[0]))
            print(f"  {env_id} seed {seed}: success={ok} "
                  f"len={lens[-1]}", flush=True)
        dt = time.time() - t0
        rows.append(dict(env_id=env_id, seeds=args.seeds, success=succ,
                         failed_plans=failed_plan,
                         mean_len=(sum(lens) / len(lens)) if lens else 0,
                         wall_s=round(dt, 1)))
        print(f"{env_id}: {succ}/{args.seeds} success, "
              f"{failed_plan} failed plans, {dt:.0f}s", flush=True)

    print("\n| task | success | failed plans | mean ep len |")
    print("|---|---|---|---|")
    for r in rows:
        print(f"| {r['env_id']} | {r['success']}/{r['seeds']} "
              f"| {r['failed_plans']} | {r['mean_len']:.0f} |")
    if args.out:
        json.dump(rows, open(args.out, "w"), indent=2)


if __name__ == "__main__":
    main()
