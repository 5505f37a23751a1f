#!/usr/bin/env python
"""Grasp-phase probe: descend onto the green can, close with per-step
tracing (finger gap, pair forces, is_grasping), then lift — isolates WHY
pick_and_place grasps fail without running the whole solve.

    python tools/grasp_probe.py [--cpu] [--close_steps 20] [--grasp_z 0.03]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--close_steps", type=int, default=20)
    p.add_argument("--lift_steps", type=int, default=25)
    p.add_argument("--grasp_z", type=float, default=0.03)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--env_id", default="AlignFr3Env-v1")
    p.add_argument("--actor", default="dtc_green_can_fr3")
    args = p.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import numpy as np

    import jax.numpy as jnp

    from gsworld_tpu import envs
    from gsworld_tpu.rollout.planner.solutions import TOPDOWN_Q, _actor_pos
    from gsworld_tpu.rollout.planner.motionplanner import (
        FR3UmiMotionPlanningSolver,
    )

    env = envs.make(args.env_id, num_envs=1, obs_mode="state_dict",
                    control_mode="pd_joint_pos",
                    sim_config=dict(sim_freq=100, control_freq=20))
    env.reset(seed=args.seed)
    planner = FR3UmiMotionPlanningSolver(env)

    def env0_data():
        data = env._vmapped_data(env.state)
        return jax.tree.map(lambda x: x[0], data)

    def report(tag):
        d = env0_data()
        o = _actor_pos(env, args.actor)
        tcp, _ = planner.tcp_pose()
        g = bool(env.is_grasping(d, args.actor))
        f0 = np.asarray(env.pair_force(d, env.agent.finger_links[0],
                                       args.actor))
        f1 = np.asarray(env.pair_force(d, env.agent.finger_links[1],
                                       args.actor))
        gap = float(env.state.world.qpos[0, -1])
        print(f"[{tag:10s}] obj={np.round(o,3)} tcp_z={tcp[2]:.3f} "
              f"gap_q={gap:.4f} grasp={g} |f0|={np.linalg.norm(f0):.2f} "
              f"|f1|={np.linalg.norm(f1):.2f}", flush=True)

    obj = _actor_pos(env, args.actor)
    grasp = obj + np.array([0, 0, args.grasp_z], np.float32)
    planner.open_gripper(steps=2)
    assert planner.move_to_pose_with_screw(
        grasp + [0, 0, 0.10], TOPDOWN_Q, speed=0.6) != -1
    assert planner.move_to_pose_with_screw(
        grasp + [0, 0, 0.06], TOPDOWN_Q, refine_steps=2, speed=0.2) != -1
    assert planner.move_to_pose_with_screw(
        grasp, TOPDOWN_Q, refine_steps=2, speed=0.12) != -1
    report("descend")

    planner.gripper_state = planner.CLOSED
    q0, _, _ = planner._state0()
    act = planner._action(q0[list(planner.arm_dofs)], planner.CLOSED)
    for i in range(args.close_steps):
        env.step(act)
        report(f"close {i}")

    # slow lift like pick_and_place
    planner.move_to_pose_with_screw(grasp + [0, 0, 0.04], TOPDOWN_Q,
                                    speed=0.08, refine_steps=1)
    report("lift4cm")
    planner.move_to_pose_with_screw(grasp + [0, 0, 0.15], TOPDOWN_Q,
                                    speed=0.2)
    report("lift15cm")
    o = _actor_pos(env, args.actor)
    print(f"RESULT: obj_z={o[2]:.3f} (start {obj[2]:.3f}) "
          f"lifted={o[2] > obj[2] + 0.05}")


if __name__ == "__main__":
    main()
