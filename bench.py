#!/usr/bin/env python
"""Benchmark driver: closed-loop env steps/sec with 640x480 GS render.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Benchmark config mirrors the reference's measured path
(examples/maniskill/gsworld_rand_action_tabletop.py:107-133: AlignFr3Env-v1,
random actions, 640x480, 2 cameras, sim 120 Hz / control 40 Hz).  The
baseline divisor is the single-env closed-loop rate of the reference's
CUDA/PhysX pipeline; no published number exists (BASELINE.md), so we use
15 steps/s as a representative figure for the reference's serial
python-loop renderer on a datacenter GPU.
"""

import json
import os
import sys

REFERENCE_SINGLE_ENV_FPS = 15.0


def main():
    import jax
    cache = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
    try:
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    num_envs = int(os.environ.get("BENCH_NUM_ENVS", "4"))
    ep_len = int(os.environ.get("BENCH_EP_LEN", "10"))
    width = int(os.environ.get("BENCH_WIDTH", "640"))
    height = int(os.environ.get("BENCH_HEIGHT", "480"))
    synthetic_scale = float(os.environ.get("BENCH_SYNTH_SCALE", "1.0"))
    preset = os.environ.get("BENCH_PRESET", "")
    if preset == "smoke" or "--preset" in sys.argv and "smoke" in sys.argv:
        num_envs, ep_len, width, height, synthetic_scale = 1, 3, 160, 120, 0.05

    from gsworld_tpu.rollout.random_actions import build, rollout_fps

    # obs_mode="rgb+segmentation" is the reference's measured path
    # (gsworld_rand_action_tabletop.py:175); BENCH_OBS_MODE=rgb for the
    # rgb-only secondary row
    obs_mode = os.environ.get("BENCH_OBS_MODE", "rgb+segmentation")
    shard = (os.environ.get("BENCH_SHARD", "0") == "1"
             and len(jax.devices()) > 1)

    def measure(n_envs, length):
        env, wrapper = build(
            "AlignFr3Env-v1", num_envs=n_envs, cfg_name="fr3_align",
            sim_freq=120, control_freq=40, width=width, height=height,
            max_per_tile=int(os.environ.get("BENCH_MAX_PER_TILE", "1024")),
            tile_chunk=int(os.environ.get("BENCH_TILE_CHUNK", "16")),
            # D=64 + E=393216: zero dropped entries on the bench scene
            # (297,909 live pre-cull), 35.5 dB vs a truly-uncapped
            # reference (tools/sweep_compositor.py r3)
            max_tiles_per_gaussian=int(
                os.environ.get("BENCH_MAX_TILES", "64")),
            active_budget_frac=float(os.environ.get("BENCH_BUDGET", "1.0")),
            tile=int(os.environ.get("BENCH_TILE", "32")),
            max_entries=int(os.environ.get("BENCH_ENTRIES", "393216")),
            synthetic_scale=synthetic_scale, obs_mode=obs_mode,
            # lax.map over frames beats the single batched grid on v5e
            # (41.9 vs 37.2 steps/s @4 envs: XLA pipelines successive
            # per-frame programs, the one-grid path serializes at stage
            # barriers)
            batch_frames=os.environ.get("BENCH_BATCH_FRAMES", "0") == "1")
        fps, _, _ = rollout_fps(wrapper, length, seed=0, use_scan=True,
                                shard=shard)
        return fps

    # secondary rows first (BASELINE.json asks for 1-env and >=64-env
    # configs); the driver parses the LAST line as the headline metric
    if os.environ.get("BENCH_EXTRA_ROWS", "1") == "1" and preset != "smoke":
        for n_extra, len_extra in ((1, ep_len), (64, 3)):
            try:
                fps_x = measure(n_extra, len_extra)
                print(json.dumps({
                    "metric": f"closed-loop env steps/s, 640x480 GS "
                              f"{obs_mode} render, {n_extra} envs "
                              f"(AlignFr3Env-v1 random actions)",
                    "value": round(fps_x, 2),
                    "unit": "env-steps/s",
                    "vs_baseline": round(fps_x / REFERENCE_SINGLE_ENV_FPS,
                                         2),
                }), flush=True)
            except Exception as e:  # never lose the headline row
                print(f"# extra bench row ({n_extra} envs) failed: {e}",
                      flush=True)

    fps = measure(num_envs, ep_len)
    print(json.dumps({
        "metric": f"closed-loop env steps/s, 640x480 GS {obs_mode} render, "
                  f"{num_envs} envs (AlignFr3Env-v1 random actions)",
        "value": round(fps, 2),
        "unit": "env-steps/s",
        "vs_baseline": round(fps / REFERENCE_SINGLE_ENV_FPS, 2),
    }))


if __name__ == "__main__":
    main()
