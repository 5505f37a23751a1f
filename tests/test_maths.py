"""Golden-number tests for the core math conventions (SURVEY.md §7.3 item 5:
"port each with a golden-number test")."""

import numpy as np
import pytest

import jax.numpy as jnp

from gsworld_tpu import constants
from gsworld_tpu.core import maths as M


def rand_unit_quats(rng, n):
    q = rng.normal(size=(n, 4))
    return (q / np.linalg.norm(q, axis=-1, keepdims=True)).astype(np.float32)


class TestQuaternions:
    def test_identity(self):
        q = jnp.array([1.0, 0, 0, 0])
        np.testing.assert_allclose(M.quat_to_matrix(q), np.eye(3), atol=1e-6)

    def test_multiply_matches_matrix_product(self):
        rng = np.random.default_rng(0)
        a, b = rand_unit_quats(rng, 64), rand_unit_quats(rng, 64)
        q = M.quat_multiply(a, b)
        Rq = np.asarray(M.quat_to_matrix(q))
        Rab = np.asarray(M.quat_to_matrix(a)) @ np.asarray(M.quat_to_matrix(b))
        np.testing.assert_allclose(Rq, Rab, atol=1e-5)

    def test_matrix_quat_roundtrip(self):
        rng = np.random.default_rng(1)
        q = rand_unit_quats(rng, 256)
        q = np.where(q[:, :1] < 0, -q, q)  # canonical sign
        q2 = np.asarray(M.matrix_to_quat(M.quat_to_matrix(jnp.asarray(q))))
        np.testing.assert_allclose(q2, q, atol=1e-5)

    def test_matrix_quat_degenerate_cases(self):
        # 180-degree rotations hit every branch of the conversion
        for R in [constants.x_180_deg_rot, constants.y_180_deg_rot,
                  constants.z_180_deg_rot, np.eye(3)]:
            q = M.matrix_to_quat(jnp.asarray(R, jnp.float32))
            R2 = np.asarray(M.quat_to_matrix(q))
            np.testing.assert_allclose(R2, R, atol=1e-6)

    def test_rotate_matches_matrix(self):
        rng = np.random.default_rng(2)
        q = rand_unit_quats(rng, 32)
        v = rng.normal(size=(32, 3)).astype(np.float32)
        out = np.asarray(M.quat_rotate(jnp.asarray(q), jnp.asarray(v)))
        ref = np.einsum("nij,nj->ni", np.asarray(M.quat_to_matrix(jnp.asarray(q))), v)
        np.testing.assert_allclose(out, ref, atol=1e-5)

    def test_axis_angle(self):
        # 90 deg about z: known quaternion
        q = np.asarray(M.axis_angle_to_quat(jnp.array([0.0, 0.0, np.pi / 2])))
        np.testing.assert_allclose(
            q, [np.cos(np.pi / 4), 0, 0, np.sin(np.pi / 4)], atol=1e-6
        )

    def test_norm_preserving_compose(self):
        # reference rule (gs_utils.py:225-231): output norm == input norm
        rng = np.random.default_rng(3)
        q = (rng.normal(size=(16, 4)) * 2.0).astype(np.float32)
        qr = rand_unit_quats(rng, 16)
        out = np.asarray(M.quat_compose_preserving_norm(jnp.asarray(qr), jnp.asarray(q)))
        np.testing.assert_allclose(
            np.linalg.norm(out, axis=-1), np.linalg.norm(q, axis=-1), rtol=1e-5
        )


class TestTransforms:
    def test_rigid_inverse(self):
        rng = np.random.default_rng(4)
        q = rand_unit_quats(rng, 8)
        t = rng.normal(size=(8, 3)).astype(np.float32)
        T = M.make_tf(M.quat_to_matrix(jnp.asarray(q)), jnp.asarray(t))
        TI = M.tf_inverse_rigid(T)
        np.testing.assert_allclose(
            np.asarray(T @ TI), np.broadcast_to(np.eye(4), (8, 4, 4)), atol=1e-5
        )

    def test_pose_compose_matches_matrix(self):
        rng = np.random.default_rng(5)
        q1, q2 = rand_unit_quats(rng, 8), rand_unit_quats(rng, 8)
        p1 = rng.normal(size=(8, 3)).astype(np.float32)
        p2 = rng.normal(size=(8, 3)).astype(np.float32)
        p, q = M.pose_multiply(jnp.asarray(p1), jnp.asarray(q1),
                               jnp.asarray(p2), jnp.asarray(q2))
        T = np.asarray(M.tf_from_pq(jnp.asarray(p1), jnp.asarray(q1))) @ \
            np.asarray(M.tf_from_pq(jnp.asarray(p2), jnp.asarray(q2)))
        np.testing.assert_allclose(np.asarray(M.tf_from_pq(p, q)), T, atol=1e-5)

    def test_euler2mat_matches_reference_constant(self):
        # constants.py:279-280: cylinder_fix = euler2mat(0, -pi/2, 0)
        R = np.asarray(M.euler2mat(0.0, -np.pi / 2, 0.0))
        np.testing.assert_allclose(R, constants.cylinder_fix[:3, :3], atol=1e-7)


class TestPolarDecomposition:
    """extract_rigid_transform parity with the reference SVD recipe
    (pcd_utils.py:224-252), exercised on the real calibration matrices."""

    @pytest.mark.parametrize("name,mat", [
        ("arm", constants.sim2gs_arm_trans),
        ("xarm", constants.sim2gs_xarm_trans),
        ("r1", constants.sim2gs_r1_trans),
        ("banana", constants.sim2gs_banana_trans),
        ("green_can", constants.sim2gs_dtc_green_can),
    ])
    def test_svd_matches_numpy(self, name, mat):
        rigid, scale, R, t = M.extract_rigid_transform(jnp.asarray(mat))
        U, S, Vh = np.linalg.svd(mat[:3, :3])
        np.testing.assert_allclose(float(scale), S.mean(), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(R), U @ Vh, atol=2e-5)
        np.testing.assert_allclose(np.asarray(t), mat[:3, 3], atol=1e-7)

    @pytest.mark.parametrize("mat", [
        constants.sim2gs_arm_trans,
        constants.sim2gs_xarm_trans,
        constants.sim2gs_banana_trans,
        constants.sim2gs_dtc_red_tomato_can,
    ])
    def test_fast_path_matches_svd(self, mat):
        """The jit-friendly analytic polar decomposition must agree with the
        SVD recipe on real calibration data (these are scaled-ICP outputs,
        i.e. near-exact uniform-scaled rotations)."""
        _, s1, R1, _ = M.extract_rigid_transform(jnp.asarray(mat))
        _, s2, R2, _ = M.extract_rigid_transform_fast(jnp.asarray(mat))
        np.testing.assert_allclose(float(s2), float(s1), rtol=1e-4)
        np.testing.assert_allclose(np.asarray(R2), np.asarray(R1), atol=1e-4)

    def test_batched(self):
        mats = np.stack([constants.sim2gs_arm_trans,
                         constants.sim2gs_xarm_trans])
        rigid, scale, R, t = M.extract_rigid_transform(jnp.asarray(mats))
        assert rigid.shape == (2, 4, 4) and scale.shape == (2,)


class TestMisc:
    def test_inverse_sigmoid_roundtrip(self):
        x = jnp.linspace(0.01, 0.99, 50)
        np.testing.assert_allclose(
            np.asarray(1 / (1 + np.exp(-np.asarray(M.inverse_sigmoid(x))))),
            np.asarray(x), atol=1e-6)

    def test_compute_angle_between(self):
        a = jnp.array([[1.0, 0, 0]])
        b = jnp.array([[0.0, 1.0, 0]])
        np.testing.assert_allclose(
            np.asarray(M.compute_angle_between(a, b)), [np.pi / 2], atol=1e-6)
