"""Spherical-harmonics color evaluation (degree <= 3), vectorized over
Gaussians.

Implements the standard real-SH basis used by 3DGS renderers (the published
constants from the Inria paper); the reference reaches this through the CUDA
``computeColorFromSH`` (diff-gaussian-rasterization, invoked from
gaussian_renderer.render at gs_world_wrapper.py:266).  Output is
``max(SH(dir) + 0.5, 0)`` per channel.
"""

from __future__ import annotations

import jax.numpy as jnp

C0 = 0.28209479177387814
C1 = 0.4886025119029199
C2 = (1.0925484305920792, -1.0925484305920792, 0.31539156525252005,
      -1.0925484305920792, 0.5462742152960396)
C3 = (-0.5900435899266435, 2.890611442640554, -0.4570457994644658,
      0.3731763325901154, -0.4570457994644658, 1.445305721320277,
      -0.5900435899266435)


def sh_basis(dirs, degree: int = 3):
    """(..., 15) SH basis values (degrees 1..3) for unit directions."""
    x = dirs[..., 0]
    y = dirs[..., 1]
    z = dirs[..., 2]
    zero = jnp.zeros_like(x)
    xx, yy, zz = x * x, y * y, z * z
    xy, yz, xz = x * y, y * z, x * z
    b = [
        -C1 * y, C1 * z, -C1 * x,
        C2[0] * xy, C2[1] * yz, C2[2] * (2.0 * zz - xx - yy),
        C2[3] * xz, C2[4] * (xx - yy),
        C3[0] * y * (3.0 * xx - yy), C3[1] * xy * z,
        C3[2] * y * (4.0 * zz - xx - yy),
        C3[3] * z * (2.0 * zz - 3.0 * xx - 3.0 * yy),
        C3[4] * x * (4.0 * zz - xx - yy),
        C3[5] * z * (xx - yy), C3[6] * x * (xx - 3.0 * yy),
    ]
    n_active = {0: 0, 1: 3, 2: 8, 3: 15}[degree]
    b = b[:n_active] + [zero] * (15 - n_active)
    return jnp.stack(b, axis=-1)


def eval_sh(sh0, shN, dirs, degree: int = 3):
    """Evaluate SH color.

    Args:
      sh0:  (..., 3) DC coefficients (one per channel).
      shN:  (..., 45) higher-order coefficients, channel-major layout
            [ch0 c0..c14, ch1 c0..c14, ch2 c0..c14] (the PLY storage order).
      dirs: (..., 3) unit view directions (gaussian_center - cam_center).
      degree: active SH degree (0..3).

    Returns (..., 3) linear RGB, clamped to >= 0.

    The per-gaussian basis is built once (..., 15) and contracted against
    the reshaped coefficients in one fused multiply-reduce (the per-
    coefficient slicing form emitted ~45 strided-slice kernels).
    """
    result = C0 * sh0
    if degree >= 1:
        sh = shN.reshape(shN.shape[:-1] + (3, 15))
        basis = sh_basis(dirs, degree)                    # (..., 15)
        result = result + jnp.sum(basis[..., None, :] * sh, axis=-1)
    return jnp.maximum(result + 0.5, 0.0)
