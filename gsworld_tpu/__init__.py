"""gsworld_tpu — a TPU-native closed-loop photorealistic simulation engine for
robotic manipulation.

Built from scratch in JAX/XLA/Pallas with the capabilities of GSWorld
(luccachiang/GSWorld): batched rigid-body physics, a differentiable 3D Gaussian
Splatting tile rasterizer, per-link FK-driven Gaussian reposing fused into a
single jitted step+render program, plus demo collection and a real2sim
toolchain.

Subpackage map (see SURVEY.md §7.1):
  core/      math + config primitives (quaternions, SE(3), scene-config JSON)
  gs/        Gaussian scene pytree, PLY I/O, scene merging, rigid reposing
  render/    projection, tile binning, Pallas/XLA rasterizer, camera bridge
  physics/   URDF kinematics, Featherstone dynamics, contacts, PD drives
  envs/      task environments + robot agents (ManiSkill-compatible surface)
  wrapper/   GSWorldWrapper equivalent: fused step+FK+repose+render
  rollout/   random-action runners, HDF5 episode recording, motion planning
  train3dgs/ TPU 3DGS training loop (L1+SSIM, densify/prune)
  real2sim/  scene reconstruction host tools (SfM driver, ArUco, label xfer)
  dist/      device-mesh sharding of the env axis (pjit/shard_map)
"""

__version__ = "0.1.0"

# The TPU default matmul precision is bfloat16 (~3 decimal digits). The
# physics stack (CRBA mass matrices, Delassus solves, FK rotation chains)
# is numerically brittle at the reference's mass ratios (4 g objects vs
# kg-scale links): grasps that hold in f32 eject the object in bf16.
# Physics FLOPs are negligible next to rendering, so default everything
# to f32; the render's hot matmuls (prefix-scan splits, one-hot selects,
# cumsum) pass explicit per-op precisions and are unaffected.
import jax as _jax

_jax.config.update("jax_default_matmul_precision", "float32")
