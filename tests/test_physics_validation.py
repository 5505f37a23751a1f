"""Physics validation against closed-form mechanics (SURVEY.md §4: the
TPU build should exceed the reference's testing; these are the
trajectory-level contracts that don't need a SAPIEN oracle)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gsworld_tpu import constants
from gsworld_tpu.physics import builders as B
from gsworld_tpu.physics.kinematics import build_articulation
from gsworld_tpu.physics.spec_io import load_robot_spec
from gsworld_tpu.physics.world import WorldState, contact_row_count, control_step


def make_world(actor_defs, a_pos, a_lin=None, sim_freq=120, control_freq=40):
    spec = load_robot_spec("fr3_umi")
    model = build_articulation(spec)
    scene = B.make_scene(model, spec, actor_defs, contact_links=(),
                         sim_freq=sim_freq, control_freq=control_freq)
    A = scene.actors.num
    state = WorldState(
        qpos=jnp.asarray(constants.fr3_umi_gs_init_qpos),
        qvel=jnp.zeros(model.dof),
        root_pos=jnp.asarray([-5.0, 0, 0]),   # park the robot far away
        root_quat=jnp.asarray([1.0, 0, 0, 0]),
        a_pos=jnp.asarray(a_pos, jnp.float32),
        a_quat=jnp.tile(jnp.asarray([1.0, 0, 0, 0]), (A, 1)),
        a_lin=jnp.asarray(a_lin, jnp.float32) if a_lin is not None
        else jnp.zeros((A, 3)),
        a_ang=jnp.zeros((A, 3)),
        la_forces=jnp.zeros((1, 3)),
        contact_lam=jnp.zeros((contact_row_count(scene), 6)),
        a_friction=jnp.asarray(scene.actors.friction),
    )
    return scene, model, state


class TestFreeBodyIntegration:
    def test_free_fall_matches_semi_implicit_euler(self):
        """A falling box far from any contact follows the exact
        semi-implicit Euler parabola: v_k = -g h k, z_k = z0 - g h^2 k(k+1)/2."""
        box = B.box_actor("b", [0.02, 0.02, 0.02])
        scene, model, state = make_world([box], [[0.5, 0.0, 1.0]])
        step = jax.jit(lambda s: control_step(scene, s, s.qpos))
        n_ctrl = 5
        for _ in range(n_ctrl):
            state = step(state)
        h = 1.0 / 120
        k = n_ctrl * 3                                  # substeps
        z_expect = 1.0 - 9.81 * h * h * (k * (k + 1)) / 2
        v_expect = -9.81 * h * k
        np.testing.assert_allclose(float(state.a_pos[0, 2]), z_expect,
                                   atol=1e-5)
        np.testing.assert_allclose(float(state.a_lin[0, 2]), v_expect,
                                   atol=1e-5)

    def test_ballistic_horizontal_velocity_conserved(self):
        box = B.box_actor("b", [0.02, 0.02, 0.02])
        scene, model, state = make_world([box], [[0.5, 0.0, 1.0]],
                                         a_lin=[[0.3, -0.2, 0.0]])
        step = jax.jit(lambda s: control_step(scene, s, s.qpos))
        for _ in range(5):
            state = step(state)
        np.testing.assert_allclose(np.asarray(state.a_lin[0, :2]),
                                   [0.3, -0.2], atol=1e-6)

    def test_momentum_conserved_in_collision(self):
        """Two equal boxes colliding head-on in the air: total linear
        momentum along the approach axis is conserved by the impulse
        solver (restitution 0 -> they end up co-moving)."""
        b1 = B.box_actor("b1", [0.03, 0.03, 0.03], friction=0.0, mass=1.0)
        b2 = B.box_actor("b2", [0.03, 0.03, 0.03], friction=0.0, mass=1.0)
        scene, model, state = make_world(
            [b1, b2], [[0.4, 0.0, 5.0], [0.55, 0.0, 5.0]],
            a_lin=[[0.5, 0, 0], [-0.5, 0, 0]])
        step = jax.jit(lambda s: control_step(scene, s, s.qpos))
        for _ in range(8):                               # 0.2 s: they collide
            state = step(state)
        vx = np.asarray(state.a_lin[:, 0])
        assert abs(vx.sum()) < 1e-4, f"momentum drifted: {vx}"
        # inelastic contact: approach velocity removed
        assert abs(vx[0] - vx[1]) < 0.05, f"still approaching: {vx}"


class TestRenderQualityAtBenchConfig:
    def test_bench_approximations_keep_psnr(self):
        """The default capping knobs (K=1024, D=16) must stay visually
        faithful to an (effectively) uncapped render."""
        from gsworld_tpu.gs import synthetic
        from gsworld_tpu.gs.transform import PosedGaussians
        from gsworld_tpu.render.binning import bin_gaussians
        from gsworld_tpu.render.camera import RasterConfig, make_camera
        from gsworld_tpu.render.project import project_gaussians
        from gsworld_tpu.render.rasterize import composite_tiles
        rng = np.random.default_rng(0)
        splats = synthetic.make_tabletop_scene(
            seed=1, n_background=6000, n_per_link=400, n_per_object=400,
            link_labels={"a": 0, "b": 1, "c": 2},
            object_labels={"x": 100, "y": 101})
        g = PosedGaussians(
            means=jnp.asarray(splats["means"]),
            log_scales=jnp.asarray(splats["scales"]),
            quats=jnp.asarray(splats["quats"]),
            logit_opacities=jnp.asarray(splats["opacities"].reshape(-1)))
        sh0 = jnp.asarray(splats["sh0"].reshape(-1, 3))
        shN = jnp.asarray(splats["shN"].reshape(-1, 45))
        w2c = np.eye(4, dtype=np.float32)
        w2c[:3, :3] = np.array([[0, 1, 0], [0, 0, -1], [-1, 0, 0]], np.float32)
        w2c[:3, 3] = [0, 0.3, 2.0]
        cam = make_camera(w2c, 0.53, 0.4)

        def render_with(cfg):
            p = project_gaussians(g, cam, cfg, sh0, shN)
            b = bin_gaussians(p, cfg)
            return np.asarray(composite_tiles(p, b, cfg)[0])

        exact = render_with(RasterConfig(
            width=160, height=120, max_per_tile=2048,
            max_tiles_per_gaussian=64, tile_chunk=10))
        default = render_with(RasterConfig(
            width=160, height=120, max_per_tile=1024,
            max_tiles_per_gaussian=16, tile_chunk=10))
        mse = float(np.mean((exact - default) ** 2))
        psnr = 10 * np.log10(1.0 / max(mse, 1e-12))
        # this synthetic scene has adversarially fat splats (room-shell
        # blobs covering >16 tiles); trained scenes are far kinder — the
        # bound guards regressions of the capping logic
        assert psnr > 25.0, f"default-config PSNR {psnr:.1f} dB"
