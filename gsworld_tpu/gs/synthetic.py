"""Procedural semantic Gaussian scenes for hermetic tests and benchmarks.

The reference's PLY scans live on HuggingFace and are not vendored
(README.md:5-6 of the reference); this module generates statistically
realistic stand-ins — a tabletop background, per-link robot blobs and
object blobs with proper semantic labels — so every subsystem (merger,
repose, rasterizer, envs, bench) runs without external downloads. Sizes and
value distributions mimic trained 3DGS scenes (log-scales ~ N(-5.5, 0.8),
logit-opacities biased positive, near-unit wxyz quats).
"""

from __future__ import annotations

from typing import Dict, Iterable, List, Optional, Sequence, Tuple, Union

import numpy as np

from gsworld_tpu.gs.model import SH_REST_COEFFS


def _rand_quats(rng, n):
    q = rng.normal(size=(n, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    # mimic stored (unnormalized-tolerant) quats with slight norm jitter
    q *= (1.0 + 0.01 * rng.normal(size=(n, 1))).astype(np.float32)
    return q


def make_blob(
    rng: np.random.Generator,
    n: int,
    center: Sequence[float],
    extent: Union[float, Sequence[float]],
    color: Sequence[float],
    label: int,
    log_scale_mean: float = -5.5,
) -> Dict[str, np.ndarray]:
    """A Gaussian blob splat dict: points uniform in a box around center."""
    extent = np.broadcast_to(np.asarray(extent, np.float32), (3,))
    means = (np.asarray(center, np.float32)
             + rng.uniform(-1, 1, size=(n, 3)).astype(np.float32) * extent)
    c0 = 0.28209479177387814  # SH DC basis
    base_rgb = np.asarray(color, np.float32)
    rgb = np.clip(base_rgb + 0.08 * rng.normal(size=(n, 3)), 0.0, 1.0).astype(np.float32)
    sh0 = ((rgb - 0.5) / c0)[:, :, None]
    shn = (0.02 * rng.normal(size=(n, 3, SH_REST_COEFFS))).astype(np.float32)
    scales = (log_scale_mean + 0.8 * rng.normal(size=(n, 3))).astype(np.float32)
    opac = (2.0 + 1.0 * rng.normal(size=(n, 1))).astype(np.float32)  # logit
    return {
        "means": means,
        "sh0": sh0.astype(np.float32),
        "shN": shn,
        "scales": scales,
        "quats": _rand_quats(rng, n),
        "opacities": opac,
        "semantics": np.full(n, label, np.int32),
    }


def concat_splats(splats: Iterable[Dict[str, np.ndarray]]) -> Dict[str, np.ndarray]:
    splats = list(splats)
    return {k: np.concatenate([s[k] for s in splats], axis=0) for k in splats[0]}


def make_room_shell(
    rng: np.random.Generator,
    n: int,
    center: Sequence[float],
    extent: Sequence[float],
    color: Sequence[float],
    label: int = -1,
    log_scale_mean: float = -4.2,
) -> Dict[str, np.ndarray]:
    """Background splats on the *surface* of a box (floor + 4 walls +
    ceiling), like a scanned room — a filled volume would act as fog and
    occlude the scene from any camera inside it."""
    extent = np.asarray(extent, np.float64)
    center = np.asarray(center, np.float64)
    # choose faces proportionally to their area
    areas = np.array([extent[0] * extent[1],  # z faces (floor/ceiling)
                      extent[0] * extent[2],  # y faces
                      extent[1] * extent[2]]) # x faces
    areas = np.repeat(areas, 2)
    probs = areas / areas.sum()
    face = rng.choice(6, size=n, p=probs)
    u = rng.uniform(-1, 1, size=(n, 3))
    pts = u * extent
    axis = face // 2
    sign = np.where(face % 2 == 0, -1.0, 1.0)
    # project onto the chosen face along its axis
    pick = np.array([2, 2, 1, 1, 0, 0])[face]
    for a in range(3):
        m = pick == a
        pts[m, a] = sign[m] * extent[a]
    pts = pts + center
    blob = make_blob(rng, n, [0, 0, 0], 0.0, color, label,
                     log_scale_mean=log_scale_mean)
    blob["means"] = pts.astype(np.float32)
    return blob


def make_tabletop_scene(
    seed: int = 0,
    n_background: int = 20000,
    n_per_link: int = 1500,
    n_per_object: int = 3000,
    link_labels: Optional[Dict[str, Union[int, List[int]]]] = None,
    object_labels: Optional[Dict[str, int]] = None,
    link_centers: Optional[np.ndarray] = None,
) -> Dict[str, np.ndarray]:
    """A full synthetic tabletop: background plane + table + robot links +
    objects. Labels follow the constants.py scheme (-1 bg, 0..L links,
    >=100 objects)."""
    rng = np.random.default_rng(seed)
    parts = []
    # background walls/floor (label -1)
    bg = make_blob(rng, n_background, [0.3, 0.0, 0.4], [1.5, 1.5, 0.8],
                   [0.55, 0.5, 0.45], -1, log_scale_mean=-4.5)
    parts.append(bg)

    if link_labels:
        items = list(link_labels.items())
        for i, (_, label) in enumerate(items):
            c = (link_centers[i] if link_centers is not None
                 else np.array([0.0, 0.0, 0.1 + 0.09 * i], np.float32))
            labels = label if isinstance(label, list) else [label]
            for lab in labels:
                parts.append(make_blob(rng, n_per_link, c, 0.05,
                                       [0.9, 0.9, 0.92], lab))
    if object_labels:
        for j, (_, label) in enumerate(object_labels.items()):
            c = np.array([0.55, -0.25 + 0.18 * j, 0.03], np.float32)
            col = [0.2 + 0.3 * (j % 3 == 0), 0.6 * (j % 3 == 1) + 0.2,
                   0.6 * (j % 3 == 2) + 0.2]
            parts.append(make_blob(rng, n_per_object, c, [0.035, 0.035, 0.05],
                                   col, label))
    return concat_splats(parts)
