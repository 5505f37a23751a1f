"""Device-mesh sharding tests over the 8 virtual CPU devices (SURVEY.md §4:
multi-chip via XLA_FLAGS device count, no pod needed)."""

import numpy as np

import jax
import jax.numpy as jnp

from gsworld_tpu.dist import mesh as M


class TestEnvMesh:
    def test_mesh_spans_devices(self):
        m = M.env_mesh()
        assert m.shape["env"] == len(jax.devices())

    def test_shard_env_axis(self):
        m = M.env_mesh()
        n = m.shape["env"]
        x = jnp.arange(n * 4.0).reshape(n, 4)
        xs = M.shard_env_axis(x, m)
        assert len(xs.sharding.device_set) == n
        # a leaf whose leading dim doesn't divide stays replicated
        y = M.shard_env_axis(jnp.ones(3), m)
        assert len(y.sharding.device_set) in (1, n)

    def test_sharded_step_runs_and_reduces(self):
        """Env-axis-sharded physics step + psum-style metric reduction."""
        from gsworld_tpu import envs
        m = M.env_mesh()
        n = m.shape["env"]
        env = envs.make("PnpBoxFr3Env-v1", num_envs=n, obs_mode="state_dict")
        env.reset(seed=0)
        state = M.shard_env_axis(env.state, m)
        action = M.shard_env_axis(
            jnp.zeros((n, env.action_dim)), m)

        @jax.jit
        def step(s, a):
            s2, obs, rew, term, trunc, info = env._step_fn(s, a)
            return s2, jnp.mean(rew)

        s2, mean_rew = step(state, action)
        assert np.isfinite(float(mean_rew))
        # outputs stay sharded over the env axis
        assert s2.world.qpos.shape[0] == n


class TestCheckpoint:
    def test_orbax_scene_roundtrip(self, tmp_path):
        from gsworld_tpu.gs import synthetic
        from gsworld_tpu.gs.model import scene_from_splats
        from gsworld_tpu.utils.checkpoint import load_scene, save_scene
        rng = np.random.default_rng(0)
        splats = synthetic.make_blob(rng, 64, [0, 0, 0], 0.3,
                                     [0.5, 0.5, 0.5], 0)
        scene = scene_from_splats(splats)
        path = str(tmp_path / "ckpt")
        save_scene(scene, path)
        restored = load_scene(path, scene)
        np.testing.assert_allclose(np.asarray(restored.means),
                                   np.asarray(scene.means))
        np.testing.assert_array_equal(np.asarray(restored.semantics),
                                      np.asarray(scene.semantics))

    def test_env_state_roundtrip(self, tmp_path):
        from gsworld_tpu import envs
        from gsworld_tpu.utils.checkpoint import (
            load_env_state,
            save_env_state,
        )
        env = envs.make("AlignFr3Env-v1", num_envs=1, obs_mode="state_dict")
        env.reset(seed=3)
        path = str(tmp_path / "state.npz")
        save_env_state(env.state, path)
        restored = load_env_state(path, env.state)
        np.testing.assert_allclose(np.asarray(restored.world.a_pos),
                                   np.asarray(env.state.world.a_pos))

    def test_state_dict_consistency(self):
        from gsworld_tpu.utils.checkpoint import is_state_dict_consistent
        good = {"a": np.zeros((4, 3)), "b": {"c": np.ones((4, 7))}}
        bad = {"a": np.zeros((4, 3)), "b": {"c": np.ones((5, 7))}}
        assert is_state_dict_consistent(good)
        assert not is_state_dict_consistent(bad)


class TestShardedRollout:
    def test_bench_shard_path_matches_unsharded(self):
        """Runs the ACTUAL BENCH_SHARD=1 code path (rollout_fps shard=True,
        the branch bench.py takes on a pod) on the 8-virtual-device mesh at
        a non-trivial tile grid, and asserts the sharded fused step+render
        produces the same images as the unsharded one (VERDICT r3 #7)."""
        from __graft_entry__ import _build_small
        from gsworld_tpu.rollout.random_actions import rollout_fps

        n = len(jax.devices())
        env, wrapper = _build_small(n, width=128, height=96,
                                    n_background=6000)
        cam = env.cameras[0].name

        # unsharded reference step
        keys = jax.random.split(jax.random.PRNGKey(0), n)
        state, _ = wrapper._reset_and_render(keys)
        a = jnp.zeros((n, env.action_dim), jnp.float32)
        _, obs_ref, *_ = jax.jit(wrapper._step_and_render)(state, a)
        rgb_ref = np.asarray(obs_ref["sensor_data"][cam]["rgb"])

        # sharded step through the same program
        state2, _ = wrapper._reset_and_render(keys)
        m = M.env_mesh()
        state2 = M.shard_env_axis(state2, m)
        a2 = M.shard_env_axis(a, m)
        _, obs_sh, *_ = jax.jit(wrapper._step_and_render)(state2, a2)
        rgb_sh = np.asarray(obs_sh["sensor_data"][cam]["rgb"])
        assert rgb_sh.shape == rgb_ref.shape
        # uint8 images: allow a 1-count quantization wobble from reduction
        # order differences under GSPMD partitioning
        diff = np.abs(rgb_sh.astype(np.int32) - rgb_ref.astype(np.int32))
        assert diff.max() <= 1, f"sharded render diverges: max diff {diff.max()}"

        # the bench entry itself (shard=True branch) runs end to end
        fps, spf, _ = rollout_fps(wrapper, ep_len=2, use_scan=True,
                                  shard=True)
        assert fps > 0
