"""Task-env behavioral tests: all 7 reference env IDs reset/step/evaluate
(SURVEY.md §2 C10 success predicates are the behavioral contract)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gsworld_tpu import envs

ALL_ENVS = [
    "AlignFr3Env-v1", "PnpBoxFr3Env-v1", "PourMustardFr3Env-v1",
    "StackFr3Env-v1", "AlignXArmEnv-v1", "BananaRotationXArmEnv-v1",
    "SpoonOnBoardXArmEnv-v1",
]


class TestRegistry:
    def test_all_reference_ids_registered(self):
        for env_id in ALL_ENVS + ["RealFr3-v1", "RealXArm6-v1"]:
            assert env_id in envs.registered_envs(), env_id


@pytest.mark.parametrize("env_id", ALL_ENVS)
class TestEnvSmoke:
    def test_reset_and_step(self, env_id):
        env = envs.make(env_id, num_envs=2, obs_mode="state_dict")
        obs, _ = env.reset(seed=1)
        assert obs["agent"]["qpos"].shape[0] == 2
        assert "tcp_pose" in obs["extra"] or "obj_pose" in obs["extra"]
        a = env.action_space_sample(jax.random.PRNGKey(0))
        obs, rew, term, trunc, info = env.step(a)
        assert rew.shape == (2,)
        assert "success" in info
        assert not bool(jnp.any(term)), "random first step should not succeed"
        for k, v in obs["extra"].items():
            assert np.isfinite(np.asarray(v, dtype=np.float32)).all(), k

    def test_seeding_is_deterministic(self, env_id):
        env = envs.make(env_id, num_envs=1, obs_mode="state_dict")
        o1, _ = env.reset(seed=7)
        s1 = np.asarray(env.state.world.a_pos)
        o2, _ = env.reset(seed=7)
        np.testing.assert_array_equal(np.asarray(env.state.world.a_pos), s1)
        env.reset(seed=8)
        if env.scene.actors.num:
            assert not np.allclose(np.asarray(env.state.world.a_pos), s1)


class TestAlignSemantics:
    def test_success_when_cans_in_box(self):
        env = envs.make("AlignFr3Env-v1", num_envs=1, obs_mode="state_dict")
        env.reset(seed=0)
        # teleport both cans into the goal box footprint, zero velocities
        w = env.state.world
        pg = w.a_pos[:, env.actor_index["spice_rack"]]
        new_pos = w.a_pos
        for name in ("dtc_green_can_fr3", "dtc_red_tomato_can_fr3"):
            i = env.actor_index[name]
            new_pos = new_pos.at[:, i, :2].set(pg[:, :2])
        w = w.replace(a_pos=new_pos,
                      a_lin=jnp.zeros_like(w.a_lin),
                      a_ang=jnp.zeros_like(w.a_ang))
        env._state = env._state.replace(world=w)
        info = env._info(env.state)
        assert bool(info["is_obj_in_box"][0])
        assert bool(info["success"][0])

    def test_not_success_when_far(self):
        env = envs.make("AlignFr3Env-v1", num_envs=1, obs_mode="state_dict")
        env.reset(seed=0)
        info = env._info(env.state)
        assert not bool(info["success"][0])


class TestPourStatefulness:
    def test_has_poured_is_sticky(self):
        env = envs.make("PourMustardFr3Env-v1", num_envs=1,
                        obs_mode="state_dict")
        env.reset(seed=0)
        # teleport tilted bottle above the box
        w = env.state.world
        gi = env.actor_index["bread_slice"]
        oi = env.actor_index["006_mustard_bottle"]
        from gsworld_tpu.core.maths import axis_angle_to_quat
        tilted = axis_angle_to_quat(jnp.asarray([np.pi / 3, 0.0, 0.0]))
        pos = w.a_pos.at[:, oi, :2].set(w.a_pos[:, gi, :2])
        quat = w.a_quat.at[:, oi].set(tilted)
        env._state = env._state.replace(world=w.replace(a_pos=pos, a_quat=quat))
        # one step to latch the sticky state
        obs, rew, term, trunc, info = env.step(
            jnp.zeros((1, env.action_dim)))
        assert bool(info["has_poured"][0])
        assert float(env.state.task["pouring_state"][0]) > 0.0
        # move the bottle away; has_poured must stay true
        w = env.state.world
        pos = w.a_pos.at[:, oi, 0].add(0.5)
        env._state = env._state.replace(world=w.replace(a_pos=pos))
        obs, rew, term, trunc, info = env.step(jnp.zeros((1, env.action_dim)))
        assert bool(info["has_poured"][0])


class TestBananaRotation:
    def test_rotation_detected(self):
        env = envs.make("BananaRotationXArmEnv-v1", num_envs=1,
                        obs_mode="state_dict")
        env.reset(seed=0)
        from gsworld_tpu.core.maths import axis_angle_to_quat, quat_multiply
        w = env.state.world
        q0 = env._banana_init_q()
        q45 = quat_multiply(axis_angle_to_quat(jnp.asarray([0.0, 0, np.pi / 4])), q0)
        quat = w.a_quat.at[:, 0].set(q45)
        env._state = env._state.replace(world=w.replace(a_quat=quat))
        info = env._info(env.state)
        assert float(info["rotation_diff_degrees"][0]) == pytest.approx(45.0, abs=1.0)
        assert bool(info["is_rotation_correct"][0])


class TestXArmGripper:
    def test_gripper_closes_with_action(self):
        env = envs.make("AlignXArmEnv-v1", num_envs=1, obs_mode="state_dict")
        env.reset(seed=0)
        a = np.zeros((1, env.action_dim), np.float32)
        a[0, -1] = 0.85  # absolute finger target (finger_mimic, unnormalized)
        for _ in range(20):
            obs, *_ = env.step(jnp.asarray(a))
        q = np.asarray(env.state.world.qpos[0])
        di = env.agent.model.dof_names.index("drive_joint")
        assert q[di] > 0.5, f"drive joint should close, got {q[di]}"
        # mimics follow
        li = env.agent.model.dof_names.index("left_inner_knuckle_joint")
        assert abs(q[li] - q[di]) < 1e-4
