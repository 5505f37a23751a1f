"""Domain randomization: the declared DR config must actually be applied,
with per-env variation (reference real_xarm_env.py:163-230; VERDICT r1 #8)."""

import numpy as np

import jax.numpy as jnp

from gsworld_tpu import envs


def make_dr_env(num_envs=3):
    return envs.make("AlignXArmEnv-v1", num_envs=num_envs,
                     obs_mode="state_dict", domain_randomization=True)


class TestDomainRandomization:
    def test_per_env_variation(self):
        env = make_dr_env()
        env.reset(seed=0)
        w = env.state.world
        # friction: per-env gaussian noise, clipped to bounds
        fric = np.asarray(w.a_friction)
        cfg = env.domain_randomization_config
        assert fric.shape[0] == env.num_envs
        assert not np.allclose(fric[0], fric[1])
        assert (fric >= cfg.obj_friction_bounds[0] - 1e-6).all()
        assert (fric <= cfg.obj_friction_bounds[1] + 1e-6).all()
        # object scale: per-env, inside obj_scale_range
        sc = np.asarray(w.a_scale)
        assert not np.allclose(sc[0], sc[1])
        assert (sc >= cfg.obj_scale_range[0]).all()
        assert (sc <= cfg.obj_scale_range[1]).all()
        # object color: per-env uniform [0,1] rgb
        col = np.asarray(env.state.task["obj_color"])
        assert col.shape[1:] == (env.scene.actors.num, 3)
        assert not np.allclose(col[0], col[1])
        assert (col >= 0).all() and (col <= 1).all()
        # camera pose noise present
        assert "cam_pose_noise" in env.state.task

    def test_disabled_is_deterministic(self):
        env = envs.make("AlignXArmEnv-v1", num_envs=2, obs_mode="state_dict")
        env.reset(seed=0)
        w = env.state.world
        fric = np.asarray(w.a_friction)
        np.testing.assert_allclose(fric[0], fric[1])
        np.testing.assert_allclose(np.asarray(w.a_scale), 1.0)

    def test_scale_affects_contacts(self):
        """A scaled-down object must rest lower on the table."""
        env = make_dr_env(num_envs=2)
        env.reset(seed=0)
        w = env.state.world
        # force extreme scales on env 0 vs env 1 for the first actor
        sc = w.a_scale.at[0, 0].set(0.5).at[1, 0].set(1.5)
        env._state = env._state.replace(world=w.replace(a_scale=sc))
        a = np.zeros((2, env.action_dim), np.float32)
        for _ in range(25):
            env.step(jnp.asarray(a))
        z = np.asarray(env.state.world.a_pos[:, 0, 2])
        assert z[0] < z[1] - 0.01, z

    def test_tint_changes_render(self):
        """The GS wrapper must apply per-env object color tint."""
        import dataclasses

        import jax

        from gsworld_tpu.render.camera import RasterConfig
        from gsworld_tpu.wrapper.gs_env import GSWorldWrapper

        env = make_dr_env(num_envs=2)

        def shrink(c, w=64, h=48):
            K = np.asarray(c.intrinsic, np.float64).copy()
            K[0] *= w / c.width
            K[1] *= h / c.height
            return dataclasses.replace(c, width=w, height=h, intrinsic=K)

        env.cameras = [shrink(c) for c in env.cameras]
        wrapper = GSWorldWrapper(
            env, "xarm6_align",
            raster_config=RasterConfig(width=64, height=48, max_per_tile=128,
                                       tile_chunk=4),
            synthetic_sizes=dict(n_background=2000, n_per_link=150,
                                 n_per_object=150))
        obs, _ = wrapper.reset(seed=0)
        state = env._state
        # identical worlds, different tints -> different renders
        w0 = jax.tree.map(lambda x: x[0:1], state.world)
        wb = jax.tree.map(lambda x: jnp.concatenate([x, x]), w0)
        task = dict(state.task)
        col = jnp.asarray([[[1.0, 0.1, 0.1]], [[0.1, 1.0, 0.1]]])
        task["obj_color"] = jnp.broadcast_to(
            col, (2, env.scene.actors.num, 3))
        task = {k: (v if k == "obj_color"
                    else jnp.concatenate([v[0:1], v[0:1]]))
                for k, v in task.items()}
        env._state = state.replace(world=wb, task=task)
        out = wrapper.render_current_step()
        rgb = np.asarray(next(iter(out.values()))["rgb"]).astype(np.int32)
        diff = np.abs(rgb[0] - rgb[1]).max()
        assert diff > 10, f"tint produced no visible difference ({diff})"
