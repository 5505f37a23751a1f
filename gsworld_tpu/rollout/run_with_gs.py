"""Motion-planning demo collection with GS rendering.

Parity port of motionplanning/{franka,xarm6}/run_with_gs.py:67-210: build the
env + GSWorldWrapper + RecordEpisode, loop the scripted solution over seeds
until ``num_traj`` episodes pass, tracking success rate / failed-plan rate /
episode lengths.  The reference fans out with mp.Pool (:171-195); on TPU the
env axis batches instead (SURVEY.md §2.4 row 3) — this runner keeps a
``shard_index/num_shards`` seed partition for multi-host pods.
"""

from __future__ import annotations

import argparse
import time
from typing import Optional

import numpy as np


def collect(env_id: str = "AlignFr3Env-v1", cfg_name: str = "fr3_align",
            num_traj: int = 5, only_count_success: bool = False,
            output_dir: str = "./demos", save_video: bool = False,
            sim_freq: int = 100, control_freq: int = 20,
            width: int = 160, height: int = 120,
            synthetic_scale: float = 0.1, seed0: int = 0,
            shard_index: int = 0, num_shards: int = 1,
            render_gs: bool = True, max_seeds: Optional[int] = None,
            verbose: bool = True):
    import dataclasses

    import jax

    from gsworld_tpu import envs
    from gsworld_tpu.render.camera import RasterConfig
    from gsworld_tpu.rollout.planner.solutions import SOLUTIONS
    from gsworld_tpu.rollout.record import RecordEpisode
    from gsworld_tpu.wrapper.gs_env import GSWorldWrapper

    env = envs.make(env_id, num_envs=1, obs_mode="rgb",
                    control_mode="pd_joint_pos",
                    sim_config=dict(sim_freq=sim_freq,
                                    control_freq=control_freq))
    target = env
    if render_gs:
        env.cameras = [dataclasses.replace(c, width=width, height=height)
                       for c in env.cameras]
        target = GSWorldWrapper(
            env, cfg_name,
            raster_config=RasterConfig(width=width, height=height,
                                       max_per_tile=512, tile_chunk=10),
            synthetic_sizes=dict(n_background=int(120_000 * synthetic_scale),
                                 n_per_link=int(6_000 * synthetic_scale),
                                 n_per_object=int(6_000 * synthetic_scale)))
    rec = RecordEpisode(target, output_dir, save_trajectory=True,
                        save_video=save_video,
                        trajectory_name=f"trajectory.{shard_index}"
                        if num_shards > 1 else "trajectory")
    solve = SOLUTIONS[env_id]

    passed = 0
    tried = 0
    failed_plans = 0
    ep_lens = []
    seed = seed0 + shard_index
    t0 = time.time()
    while passed < num_traj:
        if max_seeds is not None and tried >= max_seeds:
            break
        res = solve(rec, seed=seed, debug=False, vis=False)
        tried += 1
        if res == -1:
            failed_plans += 1
            rec.flush_trajectory(save=False)
            rec.flush_video(save=False)
        else:
            obs, reward, terminated, truncated, info = res
            success = bool(np.asarray(info["success"]).any())
            keep = success or not only_count_success
            rec.flush_trajectory(save=keep)
            rec.flush_video(name=f"episode_seed{seed}", save=keep and save_video)
            if success:
                passed += 1
                ep_lens.append(int(np.asarray(rec.env.state.elapsed[0])))
            elif not only_count_success:
                passed += 1
        seed += num_shards
        if verbose:
            print(f"[{env_id}] tried={tried} passed={passed} "
                  f"failed_plans={failed_plans} "
                  f"elapsed={time.time()-t0:.1f}s", flush=True)
    rec.close()
    executed = tried - failed_plans  # episodes whose plan produced steps
    stats = {
        "num_traj": passed, "tried": tried,
        "success_rate": passed / executed if executed else 0.0,
        "failed_plan_rate": failed_plans / max(tried, 1),
        "avg_episode_len": float(np.mean(ep_lens)) if ep_lens else None,
    }
    if verbose:
        print(stats)
    return stats


class GaussianPlanningRunner:
    """Config-dict driven demo-collection runner (reference analog:
    motionplanning/gaussian_planning_runner.py:8-131)."""

    DEFAULTS = dict(env_id="AlignFr3Env-v1", cfg_name="fr3_align",
                    num_traj=5, only_count_success=True,
                    output_dir="./demos", save_video=False,
                    sim_freq=100, control_freq=20, seed0=0,
                    render_gs=True)

    def __init__(self, config: Optional[dict] = None):
        self.config = dict(self.DEFAULTS)
        if config:
            self.config.update(config)

    def run(self):
        return collect(**self.config)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--env_id", "-e", default="AlignFr3Env-v1")
    p.add_argument("--cfg_name", default="fr3_align")
    p.add_argument("--num_traj", "-n", type=int, default=5)
    p.add_argument("--only-count-success", action="store_true")
    p.add_argument("--output_dir", default="./demos")
    p.add_argument("--save_video", action="store_true")
    p.add_argument("--sim_freq", type=int, default=100)
    p.add_argument("--control_freq", type=int, default=20)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--no-gs", action="store_true")
    args = p.parse_args(argv)
    return collect(env_id=args.env_id, cfg_name=args.cfg_name,
                   num_traj=args.num_traj,
                   only_count_success=args.only_count_success,
                   output_dir=args.output_dir, save_video=args.save_video,
                   sim_freq=args.sim_freq, control_freq=args.control_freq,
                   seed0=args.seed, render_gs=not args.no_gs)


if __name__ == "__main__":
    main()
