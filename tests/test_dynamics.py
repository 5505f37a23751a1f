"""Dynamics correctness: CRBA/RNEA vs analytic formulas and vs an
independent Lagrangian (autodiff) derivation."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gsworld_tpu.physics import dynamics as D
from gsworld_tpu.physics.kinematics import build_articulation
from gsworld_tpu.physics.spec_io import load_robot_spec
from gsworld_tpu.physics.urdf import (
    JOINT_REVOLUTE,
    JointSpec,
    LinkSpec,
    RobotSpec,
)
from gsworld_tpu import constants


def pendulum_spec(m=2.0, r=0.4, iyy=0.05):
    links = [LinkSpec("base"),
             LinkSpec("rod", mass=m, com_pos=np.array([r, 0, 0]),
                      inertia=np.diag([0.001, iyy, iyy]))]
    joints = [JointSpec("j", JOINT_REVOLUTE, "base", "rod",
                        origin_pos=np.zeros(3), origin_rot=np.eye(3),
                        axis=np.array([0, 1.0, 0]),
                        limit_lower=-10, limit_upper=10)]
    return RobotSpec("pendulum", links, joints)


def two_r_spec(m1=1.2, m2=0.7, l1=0.5, r1=0.25, r2=0.15, i1=0.02, i2=0.01):
    links = [
        LinkSpec("base"),
        LinkSpec("a", mass=m1, com_pos=np.array([r1, 0, 0]),
                 inertia=np.diag([0.001, 0.001, i1])),
        LinkSpec("b", mass=m2, com_pos=np.array([r2, 0, 0]),
                 inertia=np.diag([0.001, 0.001, i2])),
    ]
    joints = [
        JointSpec("j1", JOINT_REVOLUTE, "base", "a", np.zeros(3), np.eye(3),
                  np.array([0, 0, 1.0]), limit_lower=-10, limit_upper=10),
        JointSpec("j2", JOINT_REVOLUTE, "a", "b", np.array([l1, 0, 0]),
                  np.eye(3), np.array([0, 0, 1.0]),
                  limit_lower=-10, limit_upper=10),
    ]
    return RobotSpec("rr", links, joints)


class TestMassMatrix:
    def test_pendulum(self):
        m, r, iyy = 2.0, 0.4, 0.05
        model = build_articulation(pendulum_spec(m, r, iyy))
        kin = D.compute_kinematics(model, jnp.asarray([0.3]))
        M = np.asarray(D.mass_matrix(model, kin))
        np.testing.assert_allclose(M[0, 0], iyy + m * r * r, rtol=1e-5)

    def test_2r_analytic(self):
        m1, m2, l1, r1, r2, i1, i2 = 1.2, 0.7, 0.5, 0.25, 0.15, 0.02, 0.01
        model = build_articulation(two_r_spec(m1, m2, l1, r1, r2, i1, i2))
        q2 = 0.6
        kin = D.compute_kinematics(model, jnp.asarray([0.2, q2]))
        M = np.asarray(D.mass_matrix(model, kin))
        c2 = np.cos(q2)
        M11 = i1 + i2 + m1 * r1**2 + m2 * (l1**2 + r2**2 + 2 * l1 * r2 * c2)
        M12 = i2 + m2 * (r2**2 + l1 * r2 * c2)
        M22 = i2 + m2 * r2**2
        np.testing.assert_allclose(M, [[M11, M12], [M12, M22]], rtol=1e-5)

    def test_fr3_spd(self):
        model = build_articulation(load_robot_spec("fr3_umi"))
        q = jnp.asarray(constants.fr3_umi_gs_init_qpos)
        kin = D.compute_kinematics(model, q)
        M = np.asarray(D.mass_matrix(model, kin))
        np.testing.assert_allclose(M, M.T, atol=1e-5)
        w = np.linalg.eigvalsh(M)
        assert w.min() > 0, f"M not SPD: {w}"


class TestBiasForces:
    def test_pendulum_gravity(self):
        m, r = 2.0, 0.4
        model = build_articulation(pendulum_spec(m, r))
        for theta in [0.0, 0.5, -1.2]:
            kin = D.compute_kinematics(model, jnp.asarray([theta]))
            bias = np.asarray(D.bias_forces(model, kin, jnp.asarray([0.0])))
            # gravity torque about +y at angle theta: m g r cos(theta);
            # equilibrium torque tau = bias must oppose it
            np.testing.assert_allclose(
                bias[0], -m * 9.81 * r * np.cos(theta), rtol=1e-4)

    def test_matches_lagrangian_autodiff(self):
        """RNEA bias == dM/dt qd - 1/2 d(qd^T M qd)/dq + dV/dq, with the
        right-hand side computed by autodiff of CRBA + FK (independent
        derivation)."""
        model = build_articulation(two_r_spec())
        rng = np.random.default_rng(0)
        q = jnp.asarray(rng.normal(size=2).astype(np.float32))
        qd = jnp.asarray(rng.normal(size=2).astype(np.float32))

        def Mfun(qq):
            return D.mass_matrix(model, D.compute_kinematics(model, qq))

        def Vfun(qq):
            kin = D.compute_kinematics(model, qq)
            mass = jnp.asarray(np.maximum(model.mass, 1e-6))
            return jnp.sum(mass * 9.81 * kin.com_w[..., 2])

        dM = jax.jacfwd(Mfun)(q)                      # (2, 2, 2)
        Mdot = jnp.einsum("ijk,k->ij", dM, qd)
        dKin = 0.5 * jax.grad(lambda qq: qd @ Mfun(qq) @ qd)(q)
        gvec = jax.grad(Vfun)(q)
        ref = Mdot @ qd - dKin + gvec

        kin = D.compute_kinematics(model, q)
        bias = D.bias_forces(model, kin, qd)
        np.testing.assert_allclose(np.asarray(bias), np.asarray(ref),
                                   rtol=1e-3, atol=1e-4)

    def test_fr3_bias_lagrangian(self):
        model = build_articulation(load_robot_spec("fr3_umi"))
        rng = np.random.default_rng(1)
        q = jnp.asarray(constants.fr3_umi_gs_init_qpos +
                        0.1 * rng.normal(size=9).astype(np.float32))
        qd = jnp.asarray(0.5 * rng.normal(size=9).astype(np.float32))

        def Mfun(qq):
            return D.mass_matrix(model, D.compute_kinematics(model, qq))

        def Vfun(qq):
            kin = D.compute_kinematics(model, qq)
            mass = jnp.asarray(np.maximum(model.mass, 1e-6))
            return jnp.sum(mass * 9.81 * kin.com_w[..., 2])

        dM = jax.jacfwd(Mfun)(q)
        Mdot = jnp.einsum("ijk,k->ij", dM, qd)
        dKin = 0.5 * jax.grad(lambda qq: qd @ Mfun(qq) @ qd)(q)
        ref = Mdot @ qd - dKin + jax.grad(Vfun)(q)
        bias = D.bias_forces(model, D.compute_kinematics(model, q), qd)
        np.testing.assert_allclose(np.asarray(bias), np.asarray(ref),
                                   rtol=2e-2, atol=2e-3)


class TestStepping:
    def test_pendulum_free_fall_direction(self):
        model = build_articulation(pendulum_spec())
        q = jnp.asarray([0.0])
        qd = jnp.asarray([0.0])
        # no drive: kp=kd=0
        q1, qd1, _ = D.step_articulation_free(
            model, q, qd, q_target=q, kp=0.0, kd=0.0, force_limit=0.0,
            h=1.0 / 120)
        # gravity torque positive about +y at theta=0 -> theta accelerates +
        assert float(qd1[0]) > 0

    def test_pd_holds_fr3_at_target(self):
        model = build_articulation(load_robot_spec("fr3_umi"))
        target = jnp.asarray(constants.fr3_umi_gs_init_qpos)
        kp = jnp.full(9, 1e3).at[7:].set(1e3)
        kd = jnp.full(9, 1e2)
        fl = jnp.full(9, 100.0)
        q, qd = target, jnp.zeros(9)

        def substep(carry, _):
            q, qd = carry
            q, qd, _ = D.step_articulation_free(
                model, q, qd, target, kp, kd, fl, h=1.0 / 120)
            return (q, qd), None

        (q, qd), _ = jax.lax.scan(substep, (q, qd), None, length=240)  # 2 s
        err = np.abs(np.asarray(q - target))
        assert err.max() < 0.05, f"PD hold error {err}"
        assert np.abs(np.asarray(qd)).max() < 0.05

    def test_pd_tracks_step_target(self):
        model = build_articulation(load_robot_spec("fr3_umi"))
        start = jnp.asarray(constants.fr3_umi_gs_init_qpos)
        target = start.at[3].add(0.3).at[0].add(-0.2)
        kp, kd, fl = jnp.full(9, 1e3), jnp.full(9, 1e2), jnp.full(9, 100.0)

        def substep(carry, _):
            q, qd = carry
            q, qd, _ = D.step_articulation_free(model, q, qd, target, kp, kd,
                                                fl, h=1.0 / 120)
            return (q, qd), None

        (q, qd), _ = jax.lax.scan(substep, (start, jnp.zeros(9)), None,
                                  length=360)  # 3 s
        err = np.abs(np.asarray(q - target))[:7]
        assert err.max() < 0.05, f"PD tracking error {err}"

    def test_batched(self):
        model = build_articulation(load_robot_spec("fr3_umi"))
        B = 4
        q = jnp.tile(jnp.asarray(constants.fr3_umi_gs_init_qpos), (B, 1))
        step = jax.vmap(lambda qq, qdd: D.step_articulation_free(
            model, qq, qdd, qq, 1e3, 1e2, 100.0, h=1.0 / 120)[:2])
        q1, qd1 = step(q, jnp.zeros((B, 9)))
        assert q1.shape == (B, 9)
