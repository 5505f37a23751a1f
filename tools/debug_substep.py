#!/usr/bin/env python
"""Dissect one physics substep at a saved grasp state: print per-contact
row geometry, Baumgarte bias, presolve/post-polish impulses and the
resulting normal velocities for the finger-object rows.

    python tools/debug_substep.py [--state /tmp/grasp_state.npz] \
        [--env AlignFr3Env-v1] [--obj dtc_red_tomato_can_fr3]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--state", default="/tmp/grasp_state.npz")
    p.add_argument("--env", default="AlignFr3Env-v1")
    p.add_argument("--obj", default="dtc_red_tomato_can_fr3")
    p.add_argument("--iters", type=int, default=None,
                   help="override solver.iterations (0 = presolve only)")
    args = p.parse_args()

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
    state = W.WorldState(
        qpos=jnp.asarray(z["qpos"][0]), qvel=jnp.asarray(z["qvel"][0]),
        root_pos=jnp.asarray(z["root_pos"][0]),
        root_quat=jnp.asarray(z["root_quat"][0]),
        a_pos=jnp.asarray(z["a_pos"][0]), a_quat=jnp.asarray(z["a_quat"][0]),
        a_lin=jnp.asarray(z["a_lin"][0]), a_ang=jnp.asarray(z["a_ang"][0]),
        la_forces=jnp.asarray(z["la_forces"][0]),
        contact_lam=jnp.pad(jnp.asarray(z["contact_lam"][0]),
                            ((0, 0), (0, 6 - z["contact_lam"].shape[-1]))),
        a_friction=jnp.asarray(z["a_friction"][0]),
        a_scale=jnp.asarray(z["a_scale"][0]))
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
    ai = env.actor_index[args.obj]
    L = model.num_links
    rows = np.where(
        np.asarray(contacts.active)
        & ((np.asarray(contacts.body_a) == L + ai)
           | (np.asarray(contacts.body_b) == L + ai)))[0]
    lname = {i: n for i, n in enumerate(model.link_names)} \
        if hasattr(model, "link_names") else {}
    print(f"h={h} active rows touching {args.obj}: {len(rows)}")
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

    # run the real solve, but also grab intermediates by re-implementing
    # the wrapper around _solve_contacts' return
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


if __name__ == "__main__":
    main()
