#!/usr/bin/env python
"""Grasp-phase probe: reproduce a single pick on one actor and print
per-step finger gap, pair forces, is_grasping and object velocity through
descend -> close -> lift — isolates WHY a grasp fails or ejects without
running the whole scripted solve.

Saves the world state before/after close (--save_descend/--save_state) for
substep dissection with tools/contact_forensics.py.

    python tools/grasp_probe.py [--env AlignFr3Env-v1] [--seed 1] \
        [--actor dtc_red_tomato_can_fr3] [--grasp_z 0.03] [--cpu]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--env", default="AlignFr3Env-v1")
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--actor", default="dtc_red_tomato_can_fr3")
    p.add_argument("--grasp_z", type=float, default=0.03)
    p.add_argument("--close_steps", type=int, default=8)
    p.add_argument("--save_descend", default="/tmp/descend_state.npz")
    p.add_argument("--save_state", default="/tmp/grasp_state.npz")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import numpy as np

    from gsworld_tpu import envs
    from gsworld_tpu.rollout.planner.motionplanner import (
        FR3UmiMotionPlanningSolver,
        XArmMotionPlanningSolver,
    )
    from gsworld_tpu.rollout.planner.solutions import (
        _actor_pos,
        _grasp_quat_for,
    )

    env = envs.make(args.env, num_envs=1, obs_mode="state_dict",
                    control_mode="pd_joint_pos",
                    sim_config=dict(sim_freq=100, control_freq=20))
    env.reset(seed=args.seed)
    cls = (XArmMotionPlanningSolver if "XArm" in args.env
           else FR3UmiMotionPlanningSolver)
    planner = cls(env)
    gq = _grasp_quat_for(env, args.actor)
    grip_ids = list(env.agent.gripper_dof_ids)

    def report(tag):
        st = env.state
        d0 = jax.tree.map(lambda x: x[0], env._vmapped_data(st))
        o = _actor_pos(env, args.actor)
        tcp, _ = planner.tcp_pose()
        fl, fr = env.agent.finger_links
        f_l = np.asarray(env.pair_force(d0, fl, args.actor))
        f_r = np.asarray(env.pair_force(d0, fr, args.actor))
        g = bool(np.asarray(env.is_grasping(d0, args.actor)))
        q = np.asarray(st.world.qpos[0])[grip_ids]
        lin = np.asarray(st.world.a_lin[0, env.actor_index[args.actor]])
        print(f"[{tag:10s}] obj={np.round(o, 4)} tcp={np.round(tcp, 4)} "
              f"fing_q={np.round(q, 4)} |fL|={np.linalg.norm(f_l):.2f} "
              f"|fR|={np.linalg.norm(f_r):.2f} grasp={g} "
              f"v={np.round(lin, 3)}", flush=True)

    def save_state(path):
        st = env.state
        np.savez(path,
                 qpos=np.asarray(st.world.qpos), qvel=np.asarray(st.world.qvel),
                 root_pos=np.asarray(st.world.root_pos),
                 root_quat=np.asarray(st.world.root_quat),
                 a_pos=np.asarray(st.world.a_pos),
                 a_quat=np.asarray(st.world.a_quat),
                 a_lin=np.asarray(st.world.a_lin),
                 a_ang=np.asarray(st.world.a_ang),
                 la_forces=np.asarray(st.world.la_forces),
                 contact_lam=np.asarray(st.world.contact_lam),
                 a_friction=np.asarray(st.world.a_friction),
                 a_scale=np.asarray(st.world.a_scale),
                 prev_target=np.asarray(st.prev_target))
        print(f"saved {path}", flush=True)

    obj = _actor_pos(env, args.actor)
    grasp = obj + np.array([0, 0, args.grasp_z], np.float32)
    planner.open_gripper(steps=2)
    assert planner.move_to_pose_with_screw(
        grasp + [0, 0, 0.10], gq, refine_steps=5, speed=0.4) != -1
    report("hover")
    assert planner.move_to_pose_with_screw(
        grasp + [0, 0, 0.06], gq, refine_steps=2, speed=0.2) != -1
    assert planner.move_to_pose_with_screw(
        grasp, gq, refine_steps=2, speed=0.12) != -1
    report("descend")
    if args.save_descend:
        save_state(args.save_descend)
    for i in range(args.close_steps):
        planner.close_gripper(steps=1)
        report(f"close{i}")
    if args.save_state:
        save_state(args.save_state)
    # slow lift, report every waypoint
    qs = planner.move_to_pose_with_screw(grasp + [0, 0, 0.06], gq,
                                         speed=0.05, dry_run=True)
    assert qs != -1
    for i, wp in enumerate(qs):
        planner.follow_path([wp])
        report(f"lift{i}")
    o = _actor_pos(env, args.actor)
    print(f"RESULT: obj_z={o[2]:.3f} (start {obj[2]:.3f}) "
          f"lifted={bool(o[2] > obj[2] + 0.04)}")


if __name__ == "__main__":
    main()
