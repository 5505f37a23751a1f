"""Scene initialization from a sparse point cloud — the simple-knn /
``GaussianModel.create_from_pcd`` equivalent.

Reference semantics (Inria ``scene/gaussian_model.py::create_from_pcd``,
reached through Semantic3DGSWrapper.create_from_pcd at
/root/reference/gsworld/mani_skill/utils/wrappers/semantic_3dgs_wrapper.py:62-67):

  * SH DC coefficients from RGB:  sh0 = (rgb - 0.5) / C0;
  * isotropic log-scales from the mean *squared* distance to the 3 nearest
    neighbors (the simple-knn CUDA kernel):
    scales = log(sqrt(clamp(mean3nn_sq, 1e-7)));
  * identity rotations, opacity logit = inverse_sigmoid(0.1);
  * semantics initialized to zeros (semantic_3dgs_wrapper.py:65-67).

KNN runs host-side at init (scipy cKDTree) — a one-time cost outside the
jit boundary, matching PARITY.md §2.3 (simple-knn row).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from gsworld_tpu.gs.model import GaussianScene, scene_from_splats

C0 = 0.28209479177387814  # SH band-0 constant
SH_REST = 45


def mean_sq_dist_3nn(points: np.ndarray) -> np.ndarray:
    """Mean squared distance to each point's 3 nearest neighbors
    (simple-knn's distCUDA2)."""
    points = np.asarray(points, np.float64)
    n = points.shape[0]
    if n <= 1:
        return np.full((n,), 1e-4)
    try:
        from scipy.spatial import cKDTree
        k = min(4, n)
        d, _ = cKDTree(points).query(points, k=k)
        return np.mean(d[:, 1:] ** 2, axis=1)
    except ImportError:
        # O(n^2) fallback for tiny clouds
        d2 = np.sum((points[:, None] - points[None]) ** 2, axis=-1)
        np.fill_diagonal(d2, np.inf)
        k = min(3, n - 1)
        return np.mean(np.sort(d2, axis=1)[:, :k], axis=1)


def rgb_to_sh0(rgb: np.ndarray) -> np.ndarray:
    """RGB2SH: DC coefficient such that band-0 SH eval reproduces rgb."""
    return (np.asarray(rgb, np.float32) - 0.5) / C0


def inverse_sigmoid(x: float) -> float:
    return float(np.log(x / (1.0 - x)))


def create_from_pcd(points: np.ndarray, colors: Optional[np.ndarray] = None,
                    semantics: Optional[np.ndarray] = None) -> GaussianScene:
    """Initialize a GaussianScene from sparse points (+ optional [0,1] RGB).

    This is the entry step of real2sim scene training: COLMAP's points3D
    feed in here, then ``train3dgs.train`` densifies and optimizes
    (colmap_and_gs.sh:119-137 flow).
    """
    points = np.asarray(points, np.float32)
    n = points.shape[0]
    if colors is None:
        colors = np.full((n, 3), 0.5, np.float32)
    colors = np.asarray(colors, np.float32)
    if colors.max() > 1.0 + 1e-6:
        colors = colors / 255.0

    dist2 = np.clip(mean_sq_dist_3nn(points), 1e-7, None)
    log_scales = np.repeat(
        np.log(np.sqrt(dist2)).astype(np.float32)[:, None], 3, axis=1)
    quats = np.zeros((n, 4), np.float32)
    quats[:, 0] = 1.0
    opac = np.full((n, 1), inverse_sigmoid(0.1), np.float32)
    sem = (np.zeros((n,), np.int32) if semantics is None
           else np.asarray(semantics, np.int32))

    return scene_from_splats(dict(
        means=points,
        sh0=rgb_to_sh0(colors).reshape(n, 3, 1),
        shN=np.zeros((n, 3, 15), np.float32),
        scales=log_scales,
        quats=quats,
        opacities=opac,
        semantics=sem,
    ))
