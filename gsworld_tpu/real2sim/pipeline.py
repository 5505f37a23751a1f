"""End-to-end real2sim scene construction driver.

Mirrors the reference orchestration (colmap_and_gs.sh:100-156):

  (1) COLMAP SfM                         -> sparse/0/{cameras,images,points3D}.txt
  (2) ArUco metric rescale               -> metric sparse model
  (3) 3DGS training from the sparse pcd  -> point_cloud/iteration_N/point_cloud.ply
  (+) export PLY into the assets layout and emit a scene-config JSON entry

Stages (1)/(2) shell out to host tools (COLMAP CLI / OpenCV) exactly like
the reference; stage (3) is the TPU training loop (train3dgs) seeded by
``gs.pcd_init.create_from_pcd`` (the simple-knn equivalent).
``train_from_colmap_model`` is the offline-testable core: it needs only a
parsed COLMAP model + images in memory.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from gsworld_tpu.gs.model import GaussianScene, scene_to_splats
from gsworld_tpu.gs.pcd_init import create_from_pcd
from gsworld_tpu.gs.ply import save_splats_to_ply
from gsworld_tpu.real2sim import colmap_io
from gsworld_tpu.render.camera import GSCamera, RasterConfig, camera_from_opencv
from gsworld_tpu.train3dgs.optim import OptimizationParams


@dataclasses.dataclass
class ReconstructionResult:
    scene: GaussianScene
    losses: List[float]
    ply_path: Optional[str] = None
    config_path: Optional[str] = None


def cameras_from_colmap(cameras: Dict[int, colmap_io.ColmapCamera],
                        images: Dict[int, colmap_io.ColmapImage],
                        width: int, height: int
                        ) -> Tuple[List[GSCamera], List[str]]:
    """Build GS cameras (and their image names) from a COLMAP model.

    The COLMAP intrinsics are rescaled if the training resolution differs
    from the capture resolution (the Inria loader's resolution divisor)."""
    cams, names = [], []
    for img in images.values():
        cc = cameras[img.camera_id]
        K = cc.K.copy()
        K[0] *= width / cc.width
        K[1] *= height / cc.height
        cams.append(camera_from_opencv(img.w2c(), K, width, height))
        names.append(img.name)
    return cams, names


def train_from_colmap_model(points_xyz: np.ndarray,
                            points_rgb: Optional[np.ndarray],
                            cams: Sequence[GSCamera],
                            images: Sequence[np.ndarray],
                            cfg: RasterConfig,
                            params: Optional[OptimizationParams] = None,
                            iterations: Optional[int] = None,
                            capacity: Optional[int] = None,
                            seed: int = 0, log_every: int = 0):
    """create_from_pcd -> train3dgs.train. Images are (H, W, 3) in [0, 1]."""
    from gsworld_tpu.train3dgs.train import train

    scene0 = create_from_pcd(points_xyz, points_rgb)
    extent = float(np.linalg.norm(
        points_xyz.max(0) - points_xyz.min(0)) / 2.0) or 1.0
    scene, ds, losses = train(scene0, list(cams), list(images), cfg,
                              params=params, iterations=iterations,
                              capacity=capacity, seed=seed,
                              scene_extent=extent, log_every=log_every)
    # drop dead capacity slots before export
    alive = np.asarray(ds.alive).astype(bool)
    import jax.tree_util as jtu
    scene = jtu.tree_map(lambda x: x[alive] if x.shape[:1] == alive.shape
                         else x, scene)
    return scene, losses


def _load_images(image_dir: str, names: Sequence[str], width: int,
                 height: int) -> List[np.ndarray]:
    import imageio.v3 as iio
    out = []
    for n in names:
        img = np.asarray(iio.imread(os.path.join(image_dir, n)))
        if img.shape[0] != height or img.shape[1] != width:
            try:
                from PIL import Image
                img = np.asarray(Image.fromarray(img).resize((width, height)))
            except ImportError:
                ys = np.linspace(0, img.shape[0] - 1, height).astype(int)
                xs = np.linspace(0, img.shape[1] - 1, width).astype(int)
                img = img[ys][:, xs]
        out.append(img[..., :3].astype(np.float32) / 255.0)
    return out


def write_scene_config(path: str, ply_rel_path: str,
                       semantic_labels=-1, transformation=()):
    """Emit a scene-config JSON in the reference schema
    (configs/fr3_align.json:1-28; consumed by gs/merge.py)."""
    cfg = {"models": [{"data_path": ply_rel_path,
                       "semantic_labels": semantic_labels,
                       "transformation": list(transformation)}]}
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        json.dump(cfg, f, indent=2)
    return path


def reconstruct_scene(data_dir: str, model_dir: str,
                      iterations: int = 30000,
                      width: Optional[int] = None,
                      height: Optional[int] = None,
                      aruco_size: Optional[float] = None,
                      skip_sfm: bool = False,
                      colmap_command: str = "colmap",
                      camera_model: str = "PINHOLE",
                      export_ply: Optional[str] = None,
                      scene_config: Optional[str] = None,
                      capacity: Optional[int] = None,
                      log_every: int = 500,
                      backend: str = "auto") -> ReconstructionResult:
    """Full images -> trained scene pipeline (colmap_and_gs.sh:100-156).

    ``data_dir`` holds ``images/`` and (after SfM) ``sparse/0``; the
    trained PLY lands in ``model_dir/point_cloud/iteration_N/`` plus the
    optional ``export_ply`` copy + ``scene_config`` JSON.
    """
    sparse = os.path.join(data_dir, "sparse", "0")
    if not skip_sfm:
        from gsworld_tpu.real2sim.sfm import run_sfm
        run_sfm(os.path.join(data_dir, "images"), data_dir,
                colmap_command=colmap_command, camera_model=camera_model)
    if aruco_size is not None:
        from gsworld_tpu.real2sim.aruco_scale import ArucoScaleFactor
        asf = ArucoScaleFactor(sparse, aruco_size=aruco_size,
                               image_dir=os.path.join(data_dir, "images"))
        asf.apply(asf.run(), sparse)

    cameras = colmap_io.read_cameras_txt(os.path.join(sparse, "cameras.txt"))
    images_meta = colmap_io.read_images_txt(os.path.join(sparse, "images.txt"))
    _, xyz, rgb = colmap_io.read_points3d_txt(
        os.path.join(sparse, "points3D.txt"))

    cam0 = next(iter(cameras.values()))
    width = width or cam0.width
    height = height or cam0.height
    cams, names = cameras_from_colmap(cameras, images_meta, width, height)
    imgs = _load_images(os.path.join(data_dir, "images"), names,
                        width, height)

    # backend="auto" dispatches to the Pallas fwd+bwd kernels on TPU
    # (rasterize._use_pallas) and the XLA compositor on CPU
    cfg = RasterConfig(width=width, height=height, backend=backend)
    scene, losses = train_from_colmap_model(
        xyz, rgb, cams, imgs, cfg, iterations=iterations,
        capacity=capacity, log_every=log_every)

    out_dir = os.path.join(model_dir, "point_cloud",
                           f"iteration_{iterations}")
    os.makedirs(out_dir, exist_ok=True)
    ply_path = os.path.join(out_dir, "point_cloud.ply")
    save_splats_to_ply(scene_to_splats(scene), ply_path)
    if export_ply:
        os.makedirs(os.path.dirname(export_ply) or ".", exist_ok=True)
        import shutil
        shutil.copyfile(ply_path, export_ply)
        ply_path = export_ply
    config_path = None
    if scene_config:
        config_path = write_scene_config(
            scene_config, os.path.basename(ply_path))
    return ReconstructionResult(scene=scene, losses=losses,
                                ply_path=ply_path, config_path=config_path)
