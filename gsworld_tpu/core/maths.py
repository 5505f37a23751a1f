"""Quaternion / rotation / SE(3) math used across the framework.

Conventions (matching the reference stack, see SURVEY.md §7.3 item 5):
  * quaternions are **wxyz** (SAPIEN / pytorch3d order), generally unnormalized
    quaternions are tolerated where noted;
  * 4x4 transforms are row-major, acting on column vectors (``p' = T @ p``);
  * Gaussian-scene scales live in log space, opacities in logit space.

Everything here is plain ``jax.numpy`` so it traces inside jit and vmaps over
arbitrary leading batch dimensions.  All functions are shape-polymorphic over
leading axes: ``quat_multiply((..., 4), (..., 4)) -> (..., 4)``.

Reference behavior replicated (file:line refer to /root/reference):
  * quaternion composition preserving the input quat norm —
    gsworld/utils/gs_utils.py:225-231 (``get_gaussian_rotation_quat_pytorch3d``)
  * polar decomposition of a scaled-rigid 4x4 into rigid + uniform scale —
    gsworld/utils/pcd_utils.py:224-252 (``extract_rigid_transform``)
  * euler2mat with Rz@Ry@Rx composition — gsworld/constants.py:262-278
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# Rotation/pose math is tiny (3x3 contractions) but precision-critical for
# render parity: force f32 accumulation instead of the TPU's default-bf16
# matmul path. Cost is negligible (these never hit the MXU efficiently).
_einsum = functools.partial(jnp.einsum, precision=jax.lax.Precision.HIGHEST)


# --------------------------------------------------------------------------- #
# Quaternions (wxyz)
# --------------------------------------------------------------------------- #

def quat_normalize(q, eps: float = 1e-12):
    return q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), eps)


def quat_multiply(a, b):
    """Hamilton product of wxyz quaternions, broadcasting over leading axes."""
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quat_conjugate(q):
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_inverse(q, eps: float = 1e-12):
    return quat_conjugate(q) / jnp.maximum(
        jnp.sum(q * q, axis=-1, keepdims=True), eps
    )


def quat_rotate(q, v):
    """Rotate vectors v (..., 3) by unit quaternions q (..., 4)."""
    qw = q[..., :1]
    qv = q[..., 1:]
    t = 2.0 * jnp.cross(qv, v)
    return v + qw * t + jnp.cross(qv, t)


def quat_to_matrix(q):
    """Unit wxyz quaternion (..., 4) -> rotation matrix (..., 3, 3)."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(q.shape[:-1] + (3, 3))


def matrix_to_quat(m):
    """Rotation matrix (..., 3, 3) -> unit wxyz quaternion (..., 4).

    Branch-free Shepperd-style construction (safe under jit/vmap): computes
    all four candidate quadruples and selects the one seeded by the largest
    of (trace, m00, m11, m22) for numerical robustness.
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    tr = m00 + m11 + m22
    # four candidates, each proportional to the true quaternion
    qw = jnp.stack([1.0 + tr, m21 - m12, m02 - m20, m10 - m01], axis=-1)
    qx = jnp.stack([m21 - m12, 1.0 + m00 - m11 - m22, m01 + m10, m02 + m20], axis=-1)
    qy = jnp.stack([m02 - m20, m01 + m10, 1.0 - m00 + m11 - m22, m12 + m21], axis=-1)
    qz = jnp.stack([m10 - m01, m02 + m20, m12 + m21, 1.0 - m00 - m11 + m22], axis=-1)

    scores = jnp.stack([tr, m00, m11, m22], axis=-1)
    case = jnp.argmax(scores, axis=-1)
    cands = jnp.stack([qw, qx, qy, qz], axis=-2)  # (..., 4 cases, 4)
    q = jnp.take_along_axis(cands, case[..., None, None].astype(jnp.int32), axis=-2)
    q = q[..., 0, :]
    q = quat_normalize(q)
    # canonical sign: w >= 0 (matches pytorch3d's standardize convention used
    # downstream only up to sign; sign is irrelevant for rotation action)
    return jnp.where(q[..., :1] < 0, -q, q)


def axis_angle_to_quat(axis_angle):
    """Axis-angle vector (..., 3) -> wxyz quaternion.

    Differentiable at zero: jnp.linalg.norm has a NaN gradient at 0
    (0/0), which poisoned every FK Jacobian at configurations with a
    joint at exactly 0.0 (the xarm task init pose) — the root cause of
    the round-4 xarm IK failures.  sqrt(max(sq, tiny)) has gradient 0
    at sq=0, and the true quat derivative there ([0, 0.5·I]) flows
    entirely through the small-angle k branch."""
    sq = jnp.sum(axis_angle * axis_angle, axis=-1, keepdims=True)
    angle = jnp.sqrt(jnp.maximum(sq, 1e-24))
    half = 0.5 * angle
    # sinc-based small-angle-safe form
    k = jnp.where(angle < 1e-8, 0.5 - angle * angle / 48.0, jnp.sin(half) / jnp.maximum(angle, 1e-30))
    return jnp.concatenate([jnp.cos(half), axis_angle * k], axis=-1)


def quat_compose_preserving_norm(q_rot, q):
    """Compose a unit rotation quat with a *possibly unnormalized* Gaussian
    orientation quat, preserving the original norm.

    Replicates gsworld/utils/gs_utils.py:225-231:
        out = quaternion_multiply(q_rot, q / |q|) * |q|
    (mathematically equal to quaternion_multiply(q_rot, q) for exact
    arithmetic; kept in this form for bit-level parity of rounding).
    """
    norm = jnp.linalg.norm(q, axis=-1, keepdims=True)
    nq = q / jnp.maximum(norm, 1e-12)
    return quat_multiply(q_rot, nq) * norm


# --------------------------------------------------------------------------- #
# SE(3) / 4x4 transforms
# --------------------------------------------------------------------------- #

def make_tf(R, t):
    """(..., 3, 3), (..., 3) -> (..., 4, 4)."""
    batch = jnp.broadcast_shapes(R.shape[:-2], t.shape[:-1])
    R = jnp.broadcast_to(R, batch + (3, 3))
    t = jnp.broadcast_to(t, batch + (3,))
    top = jnp.concatenate([R, t[..., :, None]], axis=-1)
    bottom = jnp.zeros(batch + (1, 4), dtype=top.dtype).at[..., 0, 3].set(1.0)
    return jnp.concatenate([top, bottom], axis=-2)


def tf_from_pq(p, q):
    """Position (..., 3) + wxyz quat (..., 4) -> (..., 4, 4)."""
    return make_tf(quat_to_matrix(q), p)


def tf_inverse_rigid(T):
    """Inverse of a rigid 4x4 (rotation + translation only)."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    return make_tf(Rt, -_einsum("...ij,...j->...i", Rt, t))


def tf_apply(T, p):
    """Apply 4x4 transform(s) to points (..., 3)."""
    return _einsum("...ij,...j->...i", T[..., :3, :3], p) + T[..., :3, 3]


def pose_multiply(p1, q1, p2, q2):
    """Compose two (p, q_wxyz) poses: result = pose1 ∘ pose2."""
    return p1 + quat_rotate(q1, p2), quat_multiply(q1, q2)


def pose_inverse(p, q):
    qi = quat_conjugate(q)  # assumes unit quat
    return -quat_rotate(qi, p), qi


# --------------------------------------------------------------------------- #
# Polar decomposition of scaled-rigid transforms
# --------------------------------------------------------------------------- #

def extract_rigid_transform(M):
    """Split a uniformly-scaled rigid 4x4 (..., 4, 4) into (rigid 4x4, scale).

    Mirrors gsworld/utils/pcd_utils.py:224-252: SVD of the 3x3 block, scale =
    mean singular value, rigid rotation = U @ Vh (polar factor), translation
    kept as-is.  Returns (M_rigid, scale, R_rigid, t).
    """
    A = M[..., :3, :3]
    t = M[..., :3, 3]
    U, S, Vh = jnp.linalg.svd(A)
    scale = jnp.mean(S, axis=-1)
    R = U @ Vh
    return make_tf(R, t), scale, R, t


def extract_rigid_transform_fast(M):
    """Analytic fast path for matrices that are *exactly* uniform-scaled
    rotations: scale = det(A)^(1/3), R = A / scale, refined with one Newton
    orthogonalization step R <- 1.5 R - 0.5 R R^T R.

    Matches :func:`extract_rigid_transform` to ~1e-6 on the calibration
    matrices in :mod:`gsworld_tpu.constants` (verified by tests) while
    avoiding an SVD inside the jitted step loop.
    """
    A = M[..., :3, :3]
    t = M[..., :3, 3]
    det = jnp.linalg.det(A)
    scale = jnp.cbrt(det)
    R = A / scale[..., None, None]
    R = 1.5 * R - 0.5 * _einsum("...ij,...kj,...kl->...il", R, R, R)
    R = 1.5 * R - 0.5 * _einsum("...ij,...kj,...kl->...il", R, R, R)
    return make_tf(R, t), scale, R, t


# --------------------------------------------------------------------------- #
# Misc
# --------------------------------------------------------------------------- #

def euler2mat(x, y, z):
    """Intrinsic XYZ euler -> matrix via Rz @ Ry @ Rx, replicating
    gsworld/constants.py:262-278."""
    cx, sx = jnp.cos(x), jnp.sin(x)
    cy, sy = jnp.cos(y), jnp.sin(y)
    cz, sz = jnp.cos(z), jnp.sin(z)
    Rx = jnp.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
    Ry = jnp.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    Rz = jnp.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
    return Rz @ Ry @ Rx


def matrix_to_euler_xyz(R):
    """Rotation matrix -> intrinsic XYZ euler angles (pytorch3d
    ``matrix_to_euler_angles(..., "XYZ")`` convention: R = Rx @ Ry @ Rz),
    as used by the pour-detection tilt check (pour_mustard.py:166-171)."""
    # R = Rx(a) Ry(b) Rz(c):
    #   R[0,2] = sin(b); R[1,2] = -sin(a)cos(b); R[2,2] = cos(a)cos(b)
    #   R[0,1] = -cos(b)sin(c); R[0,0] = cos(b)cos(c)
    b = jnp.arcsin(jnp.clip(R[..., 0, 2], -1.0, 1.0))
    a = jnp.arctan2(-R[..., 1, 2], R[..., 2, 2])
    c = jnp.arctan2(-R[..., 0, 1], R[..., 0, 0])
    return jnp.stack([a, b, c], axis=-1)


def quat_angle_between(q1, q2):
    """Angular difference between quats in degrees, via |w| of the relative
    rotation (rotate_banana.py:152-177 semantics)."""
    q1 = quat_normalize(q1)
    q2 = quat_normalize(q2)
    w = jnp.abs(jnp.sum(q1 * q2, axis=-1))
    return jnp.rad2deg(2.0 * jnp.arccos(jnp.clip(w, 0.0, 1.0)))


def inverse_sigmoid(x):
    """log(x / (1 - x)); the reference's opacity/scale logit transform
    (gsworld/utils/gs_utils.py:169-170)."""
    return jnp.log(x / (1.0 - x))


def compute_angle_between(a, b, eps: float = 1e-8):
    """Angle in radians between batched vectors (..., 3)."""
    na = jnp.linalg.norm(a, axis=-1)
    nb = jnp.linalg.norm(b, axis=-1)
    cos = jnp.sum(a * b, axis=-1) / jnp.maximum(na * nb, eps)
    return jnp.arccos(jnp.clip(cos, -1.0, 1.0))
