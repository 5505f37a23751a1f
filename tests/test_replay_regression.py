"""Trajectory-replay regression: a committed contact-rich trajectory pins
the physics solver's behavior (VERDICT r4 item 8).

The fixture (tests/fixtures/grasp_traj.npz) records 25 control steps of a
deterministic grasp: the green can is teleported between the fr3 fingers,
the gripper closes and holds under gravity.  The test replays the same
action sequence from the same reset and diffs the state sequence against
the fixture with rollout/replay.py's compare_trajectories — any solver
change (iteration count, kick valve, contact margins) moves the grasped
can by millimetres and fails the tolerance, so solver edits are diffed
against committed behavior instead of only behavioral contracts.

Regenerate after an INTENDED solver change:

    python tests/test_replay_regression.py
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                       "grasp_traj.npz")
STEPS = 25


def _run_trajectory():
    """Deterministic grasp sequence; returns stacked per-step states."""
    from gsworld_tpu import envs

    env = envs.make("AlignFr3Env-v1", num_envs=1, obs_mode="state_dict",
                    control_mode="pd_joint_pos",
                    sim_config=dict(sim_freq=100, control_freq=20))
    env.reset(seed=0)
    arm_q0 = np.asarray(env.state.world.qpos[0])[
        np.asarray(env.agent.arm_dof_ids)]

    # teleport the can between the fingertips (grasp-contract geometry)
    data = jax.tree.map(lambda x: x[0], env._vmapped_data(env.state))
    tcp_p, _ = env.tcp_pose(data)
    tcp_p = tcp_p - jnp.asarray([0.0, 0.0, 0.035])
    oi = env.actor_index["dtc_green_can_fr3"]
    w = env.state.world
    w = w.replace(a_pos=w.a_pos.at[:, oi].set(tcp_p),
                  a_lin=jnp.zeros_like(w.a_lin),
                  a_ang=jnp.zeros_like(w.a_ang))
    env._state = env._state.replace(world=w)

    a = np.zeros((1, env.action_dim), np.float32)
    a[0, :len(arm_q0)] = arm_q0
    a[0, -1] = -1.0                      # close
    qpos, apos, aquat = [], [], []
    for _ in range(STEPS):
        env.step(jnp.asarray(a))
        st = env.state.world
        qpos.append(np.asarray(st.qpos[0]))
        apos.append(np.asarray(st.a_pos[0]))
        aquat.append(np.asarray(st.a_quat[0]))
    return (np.stack(qpos), np.stack(apos), np.stack(aquat),
            list(env.scene.actors.names))


def test_replay_matches_committed_fixture():
    if not os.path.exists(FIXTURE):
        pytest.skip("fixture not recorded yet (run this file as a script)")
    z = np.load(FIXTURE, allow_pickle=True)
    qpos, apos, aquat, names = _run_trajectory()
    assert list(z["names"]) == names

    from gsworld_tpu.rollout.replay import compare_trajectories
    rec = {"actors": {n: z["apos"][:, i] for i, n in enumerate(names)},
           "articulations": {"robot": z["qpos"]}}
    now = {"actors": {n: apos[:, i] for i, n in enumerate(names)},
           "articulations": {"robot": qpos}}
    m = compare_trajectories(rec, now)
    # tolerances chosen so a deliberate solver perturbation (e.g.
    # iterations 32 -> 16 moves the grasped can ~5 mm) fails, while
    # run-to-run CPU XLA noise (exactly 0 observed) passes
    for n in names:
        assert m[f"actor/{n}/rmse"] < 1e-3, (n, m)
        assert m[f"actor/{n}/max"] < 3e-3, (n, m)
    assert m["articulation/robot/qpos_rmse"] < 1e-3, m
    # orientation drift guard (quat component RMSE)
    dq = np.sqrt(((aquat - z["aquat"]) ** 2).mean())
    assert dq < 2e-3, dq


if __name__ == "__main__":
    jax.config.update("jax_platforms", "cpu")
    os.makedirs(os.path.dirname(FIXTURE), exist_ok=True)
    qpos, apos, aquat, names = _run_trajectory()
    np.savez(FIXTURE, qpos=qpos, apos=apos, aquat=aquat,
             names=np.asarray(names))
    print(f"recorded {FIXTURE}: qpos {qpos.shape}, actors {apos.shape}")
