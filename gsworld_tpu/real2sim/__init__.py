"""real2sim: scene reconstruction toolchain (SURVEY.md §2 C19-C22, §3.3).

Pipeline (the reference's colmap_and_gs.sh flow):
  1. sfm.run_sfm            — COLMAP SfM (host tool)
  2. aruco_scale            — metric scaling from an ArUco marker
  3. train3dgs.train        — TPU 3DGS scene training (replaces the CUDA
                              submodule trainer)
  4. urdf_pcd               — robot scan-pose labeled point cloud
  5. alignment              — Umeyama + scaled ICP -> sim2gs matrix
  6. label_transfer         — per-gaussian semantic labels for the scan
"""

from gsworld_tpu.real2sim import (  # noqa: F401
    alignment,
    aruco_scale,
    colmap_io,
    label_transfer,
    urdf_pcd,
)
