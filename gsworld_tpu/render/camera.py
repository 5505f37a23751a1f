"""Camera model + the ManiSkill->GS camera bridge.

The GS camera convention follows the Inria ``scene.cameras.Camera`` the
reference renders through (gs_world_wrapper.py:277-325):

  * ``world_view`` is the rigid world->camera transform in the GS frame
    (OpenCV-style axes: +x right, +y down, +z forward);
  * the perspective projection is symmetric, derived from FoVx/FoVy only —
    the principal-point offset of the real intrinsics is ignored (the
    reference builds FoV from fx, fy and drops cx, cy:
    gs_world_wrapper.py:293-294); kept for parity;
  * znear=0.01 / zfar=100 for the projection matrix; the rasterizer culls at
    view depth 0.05 (GSWorld patches the CUDA near constant 0.2->0.05,
    reference README.md:33).

``cam_maniskill2gs`` mirrors gs_world_wrapper.py:277-325: take the sim's
OpenCV extrinsic, go to cam2world, scale the translation by the sim->real
scale, apply the rigid sim->real alignment, and invert back to world2cam.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Tuple

import jax.numpy as jnp

from gsworld_tpu.core.maths import tf_inverse_rigid

DEFAULT_ZNEAR = 0.01
DEFAULT_ZFAR = 100.0
GS_NEAR_CULL = 0.05  # GSWorld's patched frustum-cull depth (README.md:33)


class GSCamera(NamedTuple):
    """Traced camera parameters (all jnp arrays; W/H live in RasterConfig)."""

    world_view: jnp.ndarray  # (4, 4) rigid world->cam (GS frame)
    cam_center: jnp.ndarray  # (3,) camera position in world
    tanfovx: jnp.ndarray     # () tan(FoVx / 2)
    tanfovy: jnp.ndarray     # () tan(FoVy / 2)


@dataclasses.dataclass(frozen=True)
class RasterConfig:
    """Static rasterizer configuration (shapes must be known at trace time)."""

    width: int = 640
    height: int = 480
    # 32-px tiles are the TPU-native choice (the CUDA reference hardcodes
    # 16): 4x fewer duplicated entries for the same footprint coverage,
    # 4x fewer tile programs, and (1024, 128) MXU-shaped compositor
    # matmuls.
    tile: int = 32
    max_per_tile: int = 1024        # per-tile gaussian list capacity (XLA path)
    # D=64 with the centered rect cap + E=2^19 renders the bench scene
    # with ZERO dropped entries: 35.5 dB vs a truly-uncapped reference
    # (the fidelity cliff is steep — 12% dropped entries cost 15 dB, and
    # D<=48 halo clipping caps the scene below 28 dB; sweep data in the
    # round-3 PARITY.md fidelity table)
    max_tiles_per_gaussian: int = 64  # duplication cap in binning
    active_budget_frac: float = 1.0   # frustum-cull compaction budget (XLA path)
    max_entries: int = 1 << 19      # total (tile, gaussian) entry budget
    #                                 (Pallas segment path; budget_rank drops)
    sh_degree: int = 3
    znear_cull: float = GS_NEAR_CULL
    znear: float = DEFAULT_ZNEAR
    zfar: float = DEFAULT_ZFAR
    bg: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    tile_chunk: int = 64            # tiles rasterized per lax.map step (xla)
    backend: str = "auto"           # "auto" | "xla" | "pallas" compositor
    # entry-budget truncation order when demand exceeds max_entries:
    # "depth" (farthest-first; occlusion-correct and best measured at low
    # drop rates), "opacity", "importance" (opacity*radius^2)
    budget_rank: str = "depth"
    # exact per-tile alpha culling in the emit kernel: entries whose max
    # alpha over their tile is below the compositor's 1/255 skip are
    # never emitted — lossless (every pixel would skip them) and it
    # shrinks the per-tile segments the compositor walks
    cull_alpha: bool = True
    # pack the 8 per-entry record columns into 5 int32 sort operands
    # (tile-relative 1/64-px means, bf16 conic, 14-bit opacity, 10-bit
    # rgb, semantic id) — the entry sort is pass-bandwidth-bound, so
    # operand count is its cost; the compositor unpacks in-kernel.
    # Quantization error is far below the 30 dB parity bar
    # (tests/test_pallas_kernel.py packed-vs-unpacked)
    pack_records: bool = False

    @property
    def tiles_x(self) -> int:
        return -(-self.width // self.tile)

    @property
    def tiles_y(self) -> int:
        return -(-self.height // self.tile)

    @property
    def num_tiles(self) -> int:
        return self.tiles_x * self.tiles_y


def projection_matrix(tanfovx, tanfovy, znear=DEFAULT_ZNEAR, zfar=DEFAULT_ZFAR):
    """Symmetric perspective matrix with z_sign=+1 (Inria convention):
    maps view space to clip space; NDC after divide by w (= view depth)."""
    z = jnp.zeros(())
    o = jnp.ones(())
    zr = zfar / (zfar - znear)
    return jnp.stack([
        jnp.stack([1.0 / tanfovx, z, z, z]),
        jnp.stack([z, 1.0 / tanfovy, z, z]),
        jnp.stack([z, z, zr * o, -(zfar * znear) / (zfar - znear) * o]),
        jnp.stack([z, z, o, z]),
    ])


def make_camera(world_view, tanfovx, tanfovy) -> GSCamera:
    world_view = jnp.asarray(world_view, jnp.float32)
    c2w = tf_inverse_rigid(world_view)
    return GSCamera(
        world_view=world_view,
        cam_center=c2w[..., :3, 3],
        tanfovx=jnp.asarray(tanfovx, jnp.float32),
        tanfovy=jnp.asarray(tanfovy, jnp.float32),
    )


def camera_from_opencv(extrinsic_w2c, K, width: int, height: int) -> GSCamera:
    """GS camera directly from an OpenCV world->cam extrinsic + intrinsics
    (no sim->real remap). fov from fx, fy only, as in the reference."""
    extrinsic_w2c = jnp.asarray(extrinsic_w2c, jnp.float32)
    if extrinsic_w2c.shape[-2] == 3:
        bottom = jnp.broadcast_to(
            jnp.asarray([0, 0, 0, 1], jnp.float32),
            extrinsic_w2c.shape[:-2] + (1, 4))
        extrinsic_w2c = jnp.concatenate([extrinsic_w2c, bottom], axis=-2)
    fx = K[..., 0, 0]
    fy = K[..., 1, 1]
    tanfovx = width / (2.0 * fx)
    tanfovy = height / (2.0 * fy)
    return make_camera(extrinsic_w2c, tanfovx, tanfovy)


def cam_maniskill2gs(extrinsic_cv, K, width: int, height: int,
                     rigid_sim2real, scale_sim2real) -> GSCamera:
    """Bridge a sim camera (OpenCV extrinsic in the sim world frame) into the
    GS scene frame. Parity port of gs_world_wrapper.py:277-325.

    Args broadcast over leading batch axes (e.g. (B, 3, 4) extrinsics).
    """
    extrinsic_cv = jnp.asarray(extrinsic_cv, jnp.float32)
    if extrinsic_cv.shape[-2] == 3:
        bottom = jnp.broadcast_to(
            jnp.asarray([0, 0, 0, 1], jnp.float32),
            extrinsic_cv.shape[:-2] + (1, 4))
        sim_world2cam = jnp.concatenate([extrinsic_cv, bottom], axis=-2)
    else:
        sim_world2cam = extrinsic_cv
    sim_cam2world = tf_inverse_rigid(sim_world2cam)
    # scale the camera position into the (metric) GS frame, then rigid-align
    real_cam2world = sim_cam2world.at[..., :3, 3].multiply(scale_sim2real)
    real_world2cam = tf_inverse_rigid(
        jnp.asarray(rigid_sim2real, jnp.float32) @ real_cam2world
    )
    fx = jnp.asarray(K, jnp.float32)[..., 0, 0]
    fy = jnp.asarray(K, jnp.float32)[..., 1, 1]
    return make_camera(real_world2cam, width / (2.0 * fx), height / (2.0 * fy))
