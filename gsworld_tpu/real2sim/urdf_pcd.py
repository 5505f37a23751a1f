"""URDF -> labeled semantic point cloud at the scan pose.

Parity port of real2sim/scripts/uniform_pcd_from_urdf_visual_mesh.py
(SURVEY.md §2 C21): put the robot at ``robot_scan_qpos``, sample points
area-proportionally across the link surfaces with per-link semantic labels,
export ``<robot>.ply`` + ``<robot>_semantics.npy``.  No second env needed —
one FK evaluation poses the links (SURVEY.md §3.4)."""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np

from gsworld_tpu import constants
from gsworld_tpu.gs import ply as plyio


def sample_robot_pcd(robot_uid: str, n_points: int = 300_000,
                     qpos: Optional[np.ndarray] = None,
                     gs_semantics: Optional[Dict] = None,
                     seed: int = 0):
    """Returns (points (N, 3) world frame, labels (N,) int32)."""
    import jax
    import jax.numpy as jnp

    from gsworld_tpu.core.maths import quat_to_matrix
    from gsworld_tpu.physics.kinematics import build_articulation, forward_kinematics
    from gsworld_tpu.physics.spec_io import load_robot_spec, load_surface_points

    spec = load_robot_spec(robot_uid)
    model = build_articulation(spec)
    surface = load_surface_points(robot_uid)
    if qpos is None:
        qpos = constants.robot_scan_qpos[robot_uid]
    if gs_semantics is None:
        gs_semantics, _ = constants.robot_calibration(robot_uid)

    pos, quat = forward_kinematics(model, jnp.asarray(qpos))
    pos = np.asarray(pos)
    R = np.asarray(quat_to_matrix(quat))

    rng = np.random.default_rng(seed)
    # area-proportional budget: approximate per-link area by its stored
    # surface-sample count (samples were drawn area-proportionally)
    links = [n for n in model.link_names if n in surface and n in gs_semantics]
    weights = np.asarray([len(surface[n]) for n in links], np.float64)
    weights = weights / weights.sum()
    counts = np.floor(weights * n_points).astype(int)
    counts[-1] += n_points - counts.sum()

    pts_out, labels_out = [], []
    for name, cnt in zip(links, counts):
        li = model.link_names.index(name)
        local = surface[name]
        idx = rng.integers(0, len(local), cnt)
        world = local[idx] @ R[li].T + pos[li]
        lab = gs_semantics[name]
        lab = lab[0] if isinstance(lab, list) else lab
        pts_out.append(world)
        labels_out.append(np.full(cnt, lab, np.int32))
    return (np.concatenate(pts_out).astype(np.float32),
            np.concatenate(labels_out))


def export_robot_pcd(robot_uid: str, out_dir: str, n_points: int = 300_000,
                     **kwargs):
    """Write <robot>.ply (xyz-only splat-compatible) + _semantics.npy."""
    points, labels = sample_robot_pcd(robot_uid, n_points, **kwargs)
    os.makedirs(out_dir, exist_ok=True)
    cols = {
        "x": points[:, 0], "y": points[:, 1], "z": points[:, 2],
        "nx": np.zeros(len(points), np.float32),
        "ny": np.zeros(len(points), np.float32),
        "nz": np.zeros(len(points), np.float32),
    }
    ply_path = os.path.join(out_dir, f"{robot_uid}.ply")
    plyio.write_ply_vertex(ply_path, cols)
    np.save(os.path.join(out_dir, f"{robot_uid}_semantics.npy"), labels)
    return ply_path
