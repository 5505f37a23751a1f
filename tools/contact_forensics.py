#!/usr/bin/env python
"""Contact-solver forensics on a saved world state (tools/grasp_probe.py
--save_state): dissect the rows touching one actor.

Modes:
  rows (default) — ONE substep: per-row geometry, Baumgarte bias,
      impulses, pre/post normal+tangential velocities (runs on CPU).
  lift — replay a slow lift substep-by-substep from the saved state,
      printing per-row impulses + object velocity until an ejection.

    python tools/contact_forensics.py [--mode rows|lift] \
        [--state /tmp/grasp_state.npz] [--env AlignFr3Env-v1] \
        [--actor dtc_red_tomato_can_fr3]
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


def load_world(env, z):
    world = env.state.world.replace(
        qpos=z["qpos"], qvel=z["qvel"], root_pos=z["root_pos"],
        root_quat=z["root_quat"], a_pos=z["a_pos"], a_quat=z["a_quat"],
        a_lin=z["a_lin"], a_ang=z["a_ang"], la_forces=z["la_forces"],
        contact_lam=np.pad(z["contact_lam"],
                           ((0, 0), (0, 0),
                            (0, 6 - z["contact_lam"].shape[-1]))),
        a_friction=z["a_friction"], a_scale=z["a_scale"])
    return jax.tree.map(jnp.asarray, world)


def mode_rows(args):
    """Dissect one substep: row geometry, bias, impulses, velocities."""
    jax.config.update("jax_platforms", "cpu")
    from gsworld_tpu import envs
    from gsworld_tpu.core.maths import _einsum
    from gsworld_tpu.physics import dynamics as D
    from gsworld_tpu.physics import world as W

    env = envs.make(args.env, num_envs=1, obs_mode="state_dict",
                    control_mode="pd_joint_pos",
                    sim_config=dict(sim_freq=100, control_freq=20))
    scene = env.scene
    if args.iters is not None:
        import dataclasses
        scene = dataclasses.replace(
            scene, solver=dataclasses.replace(scene.solver,
                                              iterations=args.iters))
    model = scene.model
    z = np.load(args.state)
    state = jax.tree.map(lambda x: x[0], load_world(env, z))
    q_target = jnp.asarray(z["prev_target"][0])
    # keep closing
    grip = list(env.agent.gripper_dof_ids)
    q_target = q_target.at[jnp.asarray(grip)].set(-0.01)

    h = scene.h
    anc_mask = jnp.asarray(D._ancestor_dofs(model), jnp.float32)
    kin = D.compute_kinematics(model, state.qpos, state.root_pos,
                               state.root_quat)
    M = D.mass_matrix(model, kin)
    bias = D.bias_forces(model, kin, state.qvel)
    comp = bias if scene.compensate_passive else None
    qvel_free, Minv_eff = D.implicit_pd_velocity(
        model, M, bias, state.qpos, state.qvel, q_target,
        jnp.asarray(scene.kp), jnp.asarray(scene.kd),
        jnp.asarray(scene.force_limit), h, tau_external=comp)
    a_lin_free = state.a_lin + h * D.GRAVITY
    a_ang_free = state.a_ang

    contacts, _ = W._generate_contacts(scene, kin, state)
    sp = scene.solver
    ai = env.actor_index[args.actor]
    L = model.num_links
    rows = np.where(
        np.asarray(contacts.active)
        & ((np.asarray(contacts.body_a) == L + ai)
           | (np.asarray(contacts.body_b) == L + ai)))[0]
    lname = {i: n for i, n in enumerate(model.link_names)} \
        if hasattr(model, "link_names") else {}
    print(f"h={h} active rows touching {args.actor}: {len(rows)}")
    b = np.where(
        np.asarray(contacts.pen) >= 0.0,
        np.minimum(sp.baumgarte / h
                   * np.maximum(np.asarray(contacts.pen) - sp.slop, 0.0),
                   sp.max_pen_vel),
        np.asarray(contacts.pen) / h)
    for r in rows:
        ba, bb = int(contacts.body_a[r]), int(contacts.body_b[r])
        na = lname.get(ba, f"b{ba}") if ba < L else f"actor{ba - L}"
        nb = lname.get(bb, f"b{bb}") if bb < L else f"actor{bb - L}"
        print(f"  row {r}: {na} -> {nb} pen={float(contacts.pen[r]):+.4f} "
              f"b={b[r]:+.3f} n={np.round(np.asarray(contacts.normal[r]), 3)} "
              f"pos={np.round(np.asarray(contacts.pos[r]), 3)} "
              f"mu={float(contacts.friction[r]):.2f}")

    qvel, a_lin, a_ang, lam = W._solve_contacts(
        scene, kin, contacts, Minv_eff, qvel_free, a_lin_free, a_ang_free,
        state, anc_mask, lam0=state.contact_lam)

    # relative normal velocity before/after for the object's rows
    n = contacts.normal
    t1, t2 = W._tangent_basis(n)
    dirs = jnp.stack([n, t1, t2], axis=1)
    S = kin.S
    Sw, Sv = S[:, :3], S[:, 3:]
    vel_at = Sv[None] + jnp.cross(Sw[None], contacts.pos[:, None, :])
    Jfull = _einsum("cij,cdj->cid", dirs, vel_at)
    is_link_a = (contacts.body_a >= 0) & (contacts.body_a < L)
    is_link_b = (contacts.body_b >= 0) & (contacts.body_b < L)
    anc_a = anc_mask[jnp.clip(contacts.body_a, 0, L - 1)]
    anc_b = anc_mask[jnp.clip(contacts.body_b, 0, L - 1)]
    mask = (jnp.where(is_link_a[:, None], anc_a, 0.0)
            - jnp.where(is_link_b[:, None], anc_b, 0.0))
    J_rob = Jfull * mask[:, None, :]
    A = scene.actors.num
    a_idx_a = contacts.body_a - L
    a_idx_b = contacts.body_b - L
    is_act_a = a_idx_a >= 0
    is_act_b = a_idx_b >= 0

    def lever(idx, is_act):
        com = state.a_pos[jnp.clip(idx, 0, A - 1)]
        r = contacts.pos - com
        return jnp.where(is_act[:, None], r, 0.0)

    r_a, r_b = lever(a_idx_a, is_act_a), lever(a_idx_b, is_act_b)

    def vrel(qv, al, aa):
        v = _einsum("cid,d->ci", J_rob, qv)
        lin_a = al[jnp.clip(a_idx_a, 0, A - 1)] * is_act_a[:, None]
        ang_a = aa[jnp.clip(a_idx_a, 0, A - 1)] * is_act_a[:, None]
        lin_b = al[jnp.clip(a_idx_b, 0, A - 1)] * is_act_b[:, None]
        ang_b = aa[jnp.clip(a_idx_b, 0, A - 1)] * is_act_b[:, None]
        va = lin_a + jnp.cross(ang_a, r_a)
        vb = lin_b + jnp.cross(ang_b, r_b)
        return v + _einsum("cij,cj->ci", dirs, va - vb)

    v_pre = np.asarray(vrel(qvel_free, a_lin_free, a_ang_free))
    v_post = np.asarray(vrel(qvel, a_lin, a_ang))
    lam = np.asarray(lam)
    print("\nrow  v_n(free) v_n(post)  b     lam_n  lam_t1 lam_t2 "
          "v_t1(post) v_t2(post)")
    for r in rows:
        print(f"  {r:3d} {v_pre[r, 0]:+8.3f} {v_post[r, 0]:+8.3f} "
              f"{b[r]:+.3f} {lam[r, 0]:7.3f} {lam[r, 1]:+6.3f} "
              f"{lam[r, 2]:+6.3f} {v_post[r, 1]:+8.3f} {v_post[r, 2]:+8.3f}")
    gd = list(env.agent.gripper_dof_ids)
    print(f"\ngripper qvel_free={np.asarray(qvel_free)[gd]} "
          f"qvel_post={np.asarray(qvel)[gd]}")
    print(f"obj v post: lin={np.round(np.asarray(a_lin[ai]), 4)} "
          f"ang={np.round(np.asarray(a_ang[ai]), 4)}")


def mode_lift(args):
    """Replay a slow lift from the saved state substep by substep."""
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
    world = load_world(env, z)
    env._state = env._state.replace(
        world=world, prev_target=jnp.asarray(z["prev_target"]))

    planner = FR3UmiMotionPlanningSolver(env)
    planner.gripper_state = planner.CLOSED
    oi = env.actor_index[args.actor]
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


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--mode", choices=("rows", "lift"), default="rows")
    p.add_argument("--state", default="/tmp/grasp_state.npz")
    p.add_argument("--env", default="AlignFr3Env-v1")
    p.add_argument("--actor", default="dtc_red_tomato_can_fr3")
    p.add_argument("--iters", type=int, default=None,
                   help="rows: override solver.iterations (0 = presolve)")
    p.add_argument("--steps", type=int, default=4)
    p.add_argument("--speed", type=float, default=0.05)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if args.mode == "rows":
        mode_rows(args)
    else:
        mode_lift(args)


if __name__ == "__main__":
    main()
