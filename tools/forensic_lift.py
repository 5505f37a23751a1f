#!/usr/bin/env python
"""Replay the lift from a probe_grasp-saved state substep by substep and
print per-contact-row impulses + object velocity to pinpoint an ejection.

    GSW_FQP=pgs python tools/forensic_lift.py [--state /tmp/grasp_state.npz]
        [--env AlignFr3Env-v1] [--obj dtc_green_can_fr3] [--steps 4]
"""

import argparse
import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--state", default="/tmp/grasp_state.npz")
    p.add_argument("--env", default="AlignFr3Env-v1")
    p.add_argument("--obj", default="dtc_green_can_fr3")
    p.add_argument("--steps", type=int, default=4)
    p.add_argument("--speed", type=float, default=0.05)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from gsworld_tpu import envs
    from gsworld_tpu.physics import dynamics as D
    from gsworld_tpu.physics import world as W
    from gsworld_tpu.rollout.planner.motionplanner import (
        FR3UmiMotionPlanningSolver)
    from gsworld_tpu.rollout.planner.solutions import TOPDOWN_Q

    env = envs.make(args.env, num_envs=1, obs_mode="state_dict",
                    control_mode="pd_joint_pos",
                    sim_config=dict(sim_freq=100, control_freq=20))
    env.reset(seed=0)
    scene, model = env.scene, env.scene.model
    z = np.load(args.state)

    def col(k):
        return jnp.asarray(z[k][0])

    world = env.state.world.replace(
        qpos=z["qpos"], qvel=z["qvel"], root_pos=z["root_pos"],
        root_quat=z["root_quat"], a_pos=z["a_pos"], a_quat=z["a_quat"],
        a_lin=z["a_lin"], a_ang=z["a_ang"], la_forces=z["la_forces"],
        contact_lam=np.pad(z["contact_lam"],
                           ((0, 0), (0, 0),
                            (0, 6 - z["contact_lam"].shape[-1]))),
        a_friction=z["a_friction"], a_scale=z["a_scale"])
    world = jax.tree.map(jnp.asarray, world)
    env._state = env._state.replace(
        world=world, prev_target=jnp.asarray(z["prev_target"]))

    planner = FR3UmiMotionPlanningSolver(env)
    planner.gripper_state = planner.CLOSED
    oi = env.actor_index[args.obj]
    L = model.num_links
    tcp, _ = planner.tcp_pose()
    target = tcp + np.array([0, 0, 0.06], np.float32)
    qs = planner.move_to_pose_with_screw(target, TOPDOWN_Q,
                                         speed=args.speed, dry_run=True)
    assert qs != -1 and len(qs) >= args.steps

    anc = jnp.asarray(D._ancestor_dofs(model), jnp.float32)
    sub_j = jax.jit(functools.partial(W.physics_substep, scene))
    gd = list(env.agent.gripper_dof_ids)
    nm = list(model.link_names) if hasattr(model, "link_names") else None

    st = jax.tree.map(lambda x: x[0], env.state.world)
    prev_t = env.state.prev_target[0]
    for ci, wp in enumerate(qs[: args.steps]):
        action = jnp.asarray(planner._action(wp, planner.gripper_state))
        q_target = env.controller.compute_targets(
            st.qpos, prev_t, action, root_pos=st.root_pos,
            root_quat=st.root_quat)
        prev_t = q_target
        for s in range(scene.substeps):
            kin = D.compute_kinematics(model, st.qpos, st.root_pos,
                                       st.root_quat)
            contacts, _ = W._generate_contacts(scene, kin, st)
            act = np.asarray(contacts.active)
            rows = np.where(act & ((np.asarray(contacts.body_a) == L + oi)
                                   | (np.asarray(contacts.body_b)
                                      == L + oi)))[0]
            st2 = sub_j(st, q_target, anc)
            lam = np.asarray(st2.contact_lam)
            v = np.asarray(st2.a_lin[oi])
            w_ = np.asarray(st2.a_ang[oi])
            flag = "  <<< KICK" if np.linalg.norm(v) > 0.3 else ""
            print(f"c{ci} s{s}: fing_q={np.round(np.asarray(st.qpos)[gd], 4)}"
                  f" can_v={np.round(v, 3)} can_w={np.round(w_, 2)}{flag}",
                  flush=True)
            for r in rows:
                ba = int(contacts.body_a[r])
                bb = int(contacts.body_b[r])

                def _name(b):
                    if b < 0:
                        return "world"
                    if nm and b < L:
                        return nm[b]
                    return f"actor{b - L}"

                na, nb = _name(ba), _name(bb)
                print(f"   r{r}: {na}->{nb} "
                      f"pen={float(contacts.pen[r]):+.5f} "
                      f"n={np.round(np.asarray(contacts.normal[r]), 2)} "
                      f"pos={np.round(np.asarray(contacts.pos[r]), 3)} "
                      f"lam={np.round(lam[r, :3], 4)}", flush=True)
            st = st2
            if np.linalg.norm(v) > 0.3:
                print("ejected; stopping", flush=True)
                return


if __name__ == "__main__":
    main()
