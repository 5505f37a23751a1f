"""FK / URDF / robot-spec tests: analytic chains + extracted-robot
structure checks (reference parity: qpos order matches the SAPIEN layouts the
calibration qpos tables assume, constants.py:163-179)."""

import numpy as np
import pytest

import jax.numpy as jnp

from gsworld_tpu import constants
from gsworld_tpu.physics.kinematics import (
    apply_mimic,
    build_articulation,
    forward_kinematics,
)
from gsworld_tpu.physics.spec_io import load_robot_spec, load_surface_points
from gsworld_tpu.physics.urdf import (
    JOINT_PRISMATIC,
    JOINT_REVOLUTE,
    JointSpec,
    LinkSpec,
    MimicSpec,
    RobotSpec,
)


def two_link_planar(l1=0.5, l2=0.3):
    """Analytic 2R planar arm in the xy plane, z revolute axes."""
    links = [LinkSpec("base"), LinkSpec("l1", mass=1.0), LinkSpec("l2", mass=1.0)]
    joints = [
        JointSpec("j1", JOINT_REVOLUTE, "base", "l1",
                  origin_pos=np.zeros(3), origin_rot=np.eye(3),
                  axis=np.array([0, 0, 1.0]), limit_lower=-np.pi, limit_upper=np.pi),
        JointSpec("j2", JOINT_REVOLUTE, "l1", "l2",
                  origin_pos=np.array([l1, 0, 0]), origin_rot=np.eye(3),
                  axis=np.array([0, 0, 1.0]), limit_lower=-np.pi, limit_upper=np.pi),
    ]
    return RobotSpec("planar2r", links, joints)


class TestAnalyticChains:
    def test_2r_fk(self):
        spec = two_link_planar()
        model = build_articulation(spec)
        q1, q2 = 0.4, -0.7
        pos, quat = forward_kinematics(model, jnp.asarray([q1, q2]))
        # analytic: l2 origin at (l1 cos q1, l1 sin q1)
        np.testing.assert_allclose(
            np.asarray(pos[2]), [0.5 * np.cos(q1), 0.5 * np.sin(q1), 0], atol=1e-6)
        # l2 frame orientation = rotz(q1 + q2)
        from gsworld_tpu.core.maths import quat_to_matrix
        R = np.asarray(quat_to_matrix(quat[2]))
        c, s = np.cos(q1 + q2), np.sin(q1 + q2)
        np.testing.assert_allclose(R[:2, :2], [[c, -s], [s, c]], atol=1e-6)

    def test_prismatic(self):
        links = [LinkSpec("base"), LinkSpec("slider")]
        joints = [JointSpec("p1", JOINT_PRISMATIC, "base", "slider",
                            origin_pos=np.array([0, 0, 0.1]), origin_rot=np.eye(3),
                            axis=np.array([0, 1.0, 0]), limit_lower=0, limit_upper=1)]
        model = build_articulation(RobotSpec("slide", links, joints))
        pos, _ = forward_kinematics(model, jnp.asarray([0.25]))
        np.testing.assert_allclose(np.asarray(pos[1]), [0, 0.25, 0.1], atol=1e-6)

    def test_batched_fk_with_root_pose(self):
        model = build_articulation(two_link_planar())
        B = 5
        q = jnp.zeros((B, 2))
        root_p = jnp.asarray(np.tile([1.0, 2.0, 3.0], (B, 1)))
        pos, _ = forward_kinematics(model, q, root_pos=root_p)
        assert pos.shape == (B, 3, 3)
        np.testing.assert_allclose(np.asarray(pos[:, 2]),
                                   np.tile([1.5, 2.0, 3.0], (B, 1)), atol=1e-6)

    def test_mimic(self):
        links = [LinkSpec("base"), LinkSpec("a"), LinkSpec("b")]
        joints = [
            JointSpec("ja", JOINT_REVOLUTE, "base", "a", np.zeros(3), np.eye(3),
                      np.array([0, 0, 1.0])),
            JointSpec("jb", JOINT_REVOLUTE, "base", "b", np.zeros(3), np.eye(3),
                      np.array([0, 0, 1.0]),
                      mimic=MimicSpec("ja", multiplier=-1.0, offset=0.1)),
        ]
        model = build_articulation(RobotSpec("m", links, joints))
        q = apply_mimic(model, jnp.asarray([0.5, 999.0]))
        np.testing.assert_allclose(np.asarray(q), [0.5, -0.4], atol=1e-6)


@pytest.mark.parametrize("name,expected_dof", [
    ("fr3_umi", 9), ("xarm6_uf_gripper", 12)])
class TestExtractedRobots:
    def test_structure(self, name, expected_dof):
        model = build_articulation(load_robot_spec(name))
        assert model.dof == expected_dof
        # scan qpos tables from constants must fit the dof layout
        assert len(constants.robot_scan_qpos[name]) == expected_dof

    def test_fk_at_scan_qpos(self, name, expected_dof):
        model = build_articulation(load_robot_spec(name))
        q = jnp.asarray(constants.robot_scan_qpos[name])
        pos, quat = forward_kinematics(model, q)
        p = np.asarray(pos)
        assert np.isfinite(p).all()
        # all links within a 2m sphere of the base, above/near the ground
        assert (np.linalg.norm(p, axis=1) < 2.0).all()
        assert (np.abs(np.linalg.norm(np.asarray(quat), axis=1) - 1) < 1e-4).all()


class TestFr3Geometry:
    """Golden numbers from the FR3 datasheet reachable through FK."""

    def test_known_joint_heights(self):
        model = build_articulation(load_robot_spec("fr3_umi"))
        pos, _ = forward_kinematics(model, jnp.zeros(9))
        p = np.asarray(pos)
        # Franka/FR3: joint1 axis at z = 0.333
        np.testing.assert_allclose(p[model.link_id("fr3_link1")][2], 0.333, atol=1e-6)
        # shoulder->elbow offset 0.316 at zero pose
        np.testing.assert_allclose(p[model.link_id("fr3_link3")][2], 0.333 + 0.316,
                                   atol=1e-6)

    def test_fingers_track_gripper_width(self):
        model = build_articulation(load_robot_spec("fr3_umi"))
        q = np.zeros(9, np.float32)
        q[7] = q[8] = 0.04
        pos, _ = forward_kinematics(model, jnp.asarray(q))
        lf = np.asarray(pos[model.link_id("fr3_leftfinger")])
        rf = np.asarray(pos[model.link_id("fr3_rightfinger")])
        np.testing.assert_allclose(np.linalg.norm(lf - rf), 0.08, atol=1e-3)

    def test_surface_points_available(self):
        surf = load_surface_points("fr3_umi")
        assert "fr3_link3" in surf and surf["fr3_link3"].shape[1] == 3
