"""Scene acquisition: load real GS scans per scene-config JSON, or
synthesize a geometrically-exact stand-in when the scans are absent.

The reference's PLY scans are external downloads (HuggingFace; reference
README.md:5-6).  ``get_scene`` first tries the real scene-config path
(gs/merge.py); if the assets are missing it builds a synthetic scene in the
*same GS frame* using the calibration DB and the extracted robot surface
points: link Gaussians are placed at ``sim2gs . T_link(scan_qpos)`` and
object Gaussians at ``sim2gs_obj . (object local surface)``, so the repose
math (gs_world_wrapper.py:110-162) moves them exactly like real scans —
renders are photorealistic only with real scans, but geometry, semantics and
performance characteristics match.
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Sequence, Tuple

import numpy as np

from gsworld_tpu import constants
from gsworld_tpu.core.maths import quat_to_matrix  # noqa: F401 (doc ref)
from gsworld_tpu.gs import merge as gsmerge
from gsworld_tpu.gs import synthetic
from gsworld_tpu.gs.model import GaussianScene, SlotLayout, build_slot_ids, scene_from_splats


def _apply_tf(T: np.ndarray, pts: np.ndarray) -> np.ndarray:
    return pts @ T[:3, :3].T + T[:3, 3]


def synthesize_scene(
    cfg_name: str,
    model,                      # ArticulationModel
    scan_qpos: np.ndarray,
    object_names: Sequence[str],
    seed: int = 0,
    n_background: int = 120_000,
    n_per_link: int = 6_000,
    n_per_object: int = 6_000,
    surface_points: Optional[Dict[str, np.ndarray]] = None,
) -> Dict[str, np.ndarray]:
    """Build a synthetic semantic splat dict in the GS frame of ``cfg_name``."""
    import jax.numpy as jnp
    from gsworld_tpu.physics.kinematics import forward_kinematics

    gs_sem, sim2gs = constants.robot_calibration(cfg_name)
    rng = np.random.default_rng(seed)
    parts = []

    # background: room shell around the work volume (in the GS frame) plus a
    # table patch — the sim tabletop plane z=0 mapped through sim2gs
    parts.append(synthetic.make_room_shell(
        rng, int(n_background * 0.7), [0.0, -0.5, 0.0], [1.8, 1.2, 1.8],
        [0.5, 0.48, 0.45], -1))
    table_sim = np.concatenate([
        rng.uniform([-0.3, -0.7, -0.01], [1.2, 0.7, 0.0],
                    size=(n_background - int(n_background * 0.7), 3))])
    tbl = synthetic.make_blob(rng, len(table_sim), [0, 0, 0], 0.0,
                              [0.45, 0.32, 0.2], -1, log_scale_mean=-4.8)
    tbl["means"] = _apply_tf(np.asarray(sim2gs, np.float64),
                             table_sim).astype(np.float32)
    parts.append(tbl)

    # robot links at their scan pose, mapped into the GS frame
    pos, quat = forward_kinematics(model, jnp.asarray(scan_qpos))
    pos = np.asarray(pos)
    quat = np.asarray(quat)
    from gsworld_tpu.core.maths import quat_to_matrix as q2m
    import jax
    Rl = np.asarray(q2m(jnp.asarray(quat)))
    for name, labels in gs_sem.items():
        if name not in model.link_names:
            continue
        li = model.link_names.index(name)
        if surface_points and name in surface_points and \
                len(surface_points[name]) > 8:
            local = np.asarray(surface_points[name])
            idx = rng.integers(0, len(local), n_per_link)
            base = local[idx] + 0.002 * rng.normal(size=(n_per_link, 3))
        else:
            base = 0.03 * rng.normal(size=(n_per_link, 3))
        world = base @ Rl[li].T + pos[li]
        gs_pts = _apply_tf(sim2gs, world)
        labels = labels if isinstance(labels, list) else [labels]
        # multi-label links (e.g. fr3_hand -> [10,14,15]) split their points
        n = len(gs_pts) // len(labels)
        for j, lab in enumerate(labels):
            sl = synthetic.make_blob(rng, n, [0, 0, 0], 0.0,
                                     [0.85, 0.85, 0.88], lab,
                                     log_scale_mean=-5.8)
            sl["means"] = gs_pts[j * n:(j + 1) * n].astype(np.float32)
            parts.append(sl)

    # objects in their own GS scan placement: sim2gs_obj . local surface
    palette = [[0.2, 0.7, 0.25], [0.75, 0.2, 0.2], [0.7, 0.6, 0.2],
               [0.3, 0.4, 0.8], [0.8, 0.5, 0.2]]
    for k, name in enumerate(object_names):
        label = constants.obj_gs_semantics[name]
        T_obj = constants.sim2gs_object_transforms.get(name, np.eye(4))
        local = rng.uniform(-1, 1, size=(n_per_object, 3)) * [0.033, 0.06, 0.033]
        gs_pts = _apply_tf(np.asarray(T_obj, np.float64), local)
        sl = synthetic.make_blob(rng, n_per_object, [0, 0, 0], 0.0,
                                 palette[k % len(palette)], label,
                                 log_scale_mean=-5.8)
        sl["means"] = gs_pts.astype(np.float32)
        parts.append(sl)

    return synthetic.concat_splats(parts)


def get_scene(cfg_name: str, model, scan_qpos, object_names,
              link_names: Sequence[str],
              asset_dir: Optional[str] = None,
              cfg_dir: Optional[str] = None,
              synthetic_seed: int = 0,
              synthetic_sizes: Optional[dict] = None,
              surface_points: Optional[Dict[str, np.ndarray]] = None,
              ) -> Tuple[GaussianScene, SlotLayout, bool]:
    """Return (scene, layout, is_real): real scan if the scene-config assets
    exist, synthetic stand-in otherwise."""
    cfg_dir = cfg_dir or constants.CFG_DIR
    asset_dir = asset_dir or constants.ASSET_DIR
    cfg_path = os.path.join(cfg_dir, f"{cfg_name}.json")
    gs_sem, _ = constants.robot_calibration(cfg_name)
    if os.path.exists(cfg_path):
        try:
            scene, layout = gsmerge.merge_scene_from_config(
                cfg_path, link_names=link_names,
                object_labels={n: constants.obj_gs_semantics[n]
                               for n in object_names},
                asset_dir=asset_dir, gs_semantics=gs_sem)
            return scene, layout, True
        except FileNotFoundError:
            pass
    splats = synthesize_scene(cfg_name, model, scan_qpos, object_names,
                              seed=synthetic_seed,
                              surface_points=surface_points,
                              **(synthetic_sizes or {}))
    slot_ids, layout = build_slot_ids(
        splats["semantics"], gs_sem, link_names,
        {n: constants.obj_gs_semantics[n] for n in object_names})
    return scene_from_splats(splats, slot_ids), layout, False
