"""Contact + solver behavior: resting stability, friction, stacking,
robot-object interaction (SURVEY.md §7.3 item 3: behavioral contracts,
bounded divergence)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gsworld_tpu import constants
from gsworld_tpu.physics import builders as B
from gsworld_tpu.physics.kinematics import build_articulation
from gsworld_tpu.physics.spec_io import load_robot_spec
from gsworld_tpu.physics.world import WorldState, control_step


def fr3_scene(actor_defs, contact_links=("fr3_leftfinger", "fr3_rightfinger",
                                         "fr3_hand")):
    spec = load_robot_spec("fr3_umi")
    model = build_articulation(spec)
    scene = B.make_scene(model, spec, actor_defs,
                         contact_links=contact_links,
                         sim_freq=120, control_freq=40)
    return spec, model, scene


def init_state(model, scene, qpos, a_pos, a_quat=None):
    A = scene.actors.num
    if a_quat is None:
        a_quat = np.tile([1.0, 0, 0, 0], (A, 1))
    from gsworld_tpu.physics.world import contact_row_count
    return WorldState(
        qpos=jnp.asarray(qpos), qvel=jnp.zeros(model.dof),
        root_pos=jnp.zeros(3), root_quat=jnp.asarray([1.0, 0, 0, 0]),
        a_pos=jnp.asarray(a_pos, jnp.float32),
        a_quat=jnp.asarray(a_quat, jnp.float32),
        a_lin=jnp.zeros((A, 3)), a_ang=jnp.zeros((A, 3)),
        la_forces=jnp.zeros((max(len(np.asarray(scene.la_pairs).reshape(-1, 2)), 1), 3)),
        contact_lam=jnp.zeros((contact_row_count(scene), 6)),
    )


def run_steps(scene, state, q_target, n):
    step = jax.jit(lambda s: control_step(scene, s, q_target))
    for _ in range(n):
        state = step(state)
    return state


class TestRestingContact:
    def test_box_drops_and_rests(self):
        box = B.box_actor("box", [0.03, 0.03, 0.05], friction=0.6)
        spec, model, scene = fr3_scene([box], contact_links=())
        q0 = constants.fr3_umi_gs_init_qpos
        state = init_state(model, scene, q0, [[0.5, 0.3, 0.09]])  # 4cm above
        state = run_steps(scene, state, jnp.asarray(q0), 40)  # 1.0 s
        z = float(state.a_pos[0, 2])
        assert abs(z - 0.05) < 0.01, f"box rests at z={z}, want 0.05"
        assert float(jnp.linalg.norm(state.a_lin[0])) < 0.05
        assert float(jnp.linalg.norm(state.a_ang[0])) < 0.5

    def test_cylinder_upright_rest(self):
        can = B.cylinder_actor("can", radius=0.033, half_length=0.05)
        spec, model, scene = fr3_scene([can], contact_links=())
        q0 = constants.fr3_umi_gs_init_qpos
        state = init_state(model, scene, q0, [[0.5, -0.2, 0.0501]])
        state = run_steps(scene, state, jnp.asarray(q0), 40)
        assert abs(float(state.a_pos[0, 2]) - 0.05) < 0.01
        # still upright
        assert float(state.a_quat[0, 0]) > 0.99

    def test_friction_stops_sliding(self):
        box = B.box_actor("box", [0.03, 0.03, 0.03], friction=0.8)
        spec, model, scene = fr3_scene([box], contact_links=())
        q0 = constants.fr3_umi_gs_init_qpos
        state = init_state(model, scene, q0, [[0.5, 0.0, 0.0301]])
        state = state.replace(a_lin=jnp.asarray([[0.5, 0.0, 0.0]]))
        state = run_steps(scene, state, jnp.asarray(q0), 40)
        v = float(jnp.linalg.norm(state.a_lin[0]))
        assert v < 0.05, f"box should stop, v={v}"
        # slid less than v^2/(2 mu g) + slack
        assert float(state.a_pos[0, 0]) - 0.5 < 0.05

    def test_frictionless_keeps_sliding(self):
        box = B.box_actor("box", [0.03, 0.03, 0.03], friction=0.0)
        spec, model, scene = fr3_scene([box], contact_links=())
        q0 = constants.fr3_umi_gs_init_qpos
        state = init_state(model, scene, q0, [[0.5, 0.0, 0.0301]])
        state = state.replace(a_lin=jnp.asarray([[0.3, 0.0, 0.0]]))
        state = run_steps(scene, state, jnp.asarray(q0), 20)  # 0.5 s
        v = float(state.a_lin[0, 0])
        assert v > 0.25, f"frictionless box decelerated: v={v}"


class TestStacking:
    def test_box_on_box(self):
        b1 = B.box_actor("b1", [0.04, 0.04, 0.04], friction=0.7)
        b2 = B.box_actor("b2", [0.03, 0.03, 0.03], friction=0.7)
        spec, model, scene = fr3_scene([b1, b2], contact_links=())
        q0 = constants.fr3_umi_gs_init_qpos
        state = init_state(model, scene, q0,
                           [[0.5, 0.0, 0.045], [0.5, 0.0, 0.125]])
        state = run_steps(scene, state, jnp.asarray(q0), 60)  # 1.5 s
        z1, z2 = float(state.a_pos[0, 2]), float(state.a_pos[1, 2])
        assert abs(z1 - 0.04) < 0.012, f"bottom box z={z1}"
        assert abs(z2 - 0.11) < 0.02, f"top box z={z2} (want ~0.11)"
        # top box still horizontally on bottom box
        dx = np.linalg.norm(np.asarray(state.a_pos[1, :2] - state.a_pos[0, :2]))
        assert dx < 0.02


class TestRobotContact:
    def test_arm_presses_box_reports_force(self):
        # tall heavy box whose top (z=0.4) lies in the fingers' descent path
        # when joint2 is driven +0.4 (fingers sweep z 0.49 -> 0.38 at x~0.40)
        box = B.box_actor("box", [0.05, 0.05, 0.2], friction=0.6, mass=5.0)
        spec, model, scene = fr3_scene([box])
        q0 = np.asarray(constants.fr3_umi_gs_init_qpos).copy()
        state = init_state(model, scene, q0, [[0.39, 0.0, 0.2]])
        target = q0.copy()
        target[1] += 0.4   # shoulder forward/down, presses onto the box top
        state = run_steps(scene, state, jnp.asarray(target), 40)
        f = np.asarray(state.la_forces)
        total = np.linalg.norm(f, axis=1).max()
        moved = np.linalg.norm(np.asarray(state.a_pos[0]) -
                               np.array([0.39, 0.0, 0.2]))
        assert total > 0.05 or moved > 0.01, (
            f"expected interaction; max force {total}, moved {moved}")
        # the arm must have been stopped short of its free-space target
        err = abs(float(state.qpos[1]) - target[1])
        assert err > 0.01, f"arm reached target through the box (err={err})"

    def test_no_contact_no_force(self):
        box = B.box_actor("box", [0.03, 0.03, 0.03])
        spec, model, scene = fr3_scene([box])
        q0 = constants.fr3_umi_gs_init_qpos
        state = init_state(model, scene, q0, [[0.8, 0.8, 0.03]])  # far away
        state = run_steps(scene, state, jnp.asarray(q0), 10)
        assert float(jnp.abs(state.la_forces).max()) < 1e-3
