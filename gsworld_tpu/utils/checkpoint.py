"""Checkpoint / resume (SURVEY.md §5.d): orbax for scene parameters and
training state; plain msgpack-free numpy bundles for env states.

Reference analogs: 3DGS training checkpoints (capture/restore tuples,
semantic_3dgs_wrapper.py:46-55; torch save at pcd_utils.py:131-139), episode
HDF5 shards (rollout/record.py), env state dicts (gs_world_wrapper.py
:135-139 reads, gsworld_sapien_utils.py:469-480 validates)."""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np


def save_scene(scene, path: str, extra: Optional[Dict[str, Any]] = None):
    """Save a GaussianScene (or any pytree of arrays) via orbax."""
    import orbax.checkpoint as ocp
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    payload = {"scene": jax.tree.map(np.asarray, scene)}
    if extra:
        payload["extra"] = jax.tree.map(np.asarray, extra)
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()
    return path


def load_scene(path: str, like):
    """Restore a scene saved by :func:`save_scene`; ``like`` provides the
    pytree structure/shapes."""
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    target = {"scene": jax.tree.map(np.asarray, like)}
    out = ckptr.restore(os.path.abspath(path), target)
    return jax.tree.map(lambda x: x, out["scene"])


def save_env_state(state, path: str):
    """Flatten an EnvState/WorldState pytree into an .npz bundle (the
    recovery-state log of run_with_gs.py:63,119-123, actually wired)."""
    leaves, treedef = jax.tree.flatten(state)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez_compressed(path, n=len(leaves),
                        **{f"leaf_{i}": np.asarray(l)
                           for i, l in enumerate(leaves)})
    return path


def load_env_state(path: str, like):
    """Restore a pytree saved by :func:`save_env_state` into the structure
    of ``like``."""
    data = np.load(path)
    leaves, treedef = jax.tree.flatten(like)
    new_leaves = [data[f"leaf_{i}"] for i in range(len(leaves))]
    return jax.tree.unflatten(treedef, new_leaves)


def is_state_dict_consistent(state_dict: Dict[str, Any]) -> bool:
    """gsworld_sapien_utils.py:469-480: every array leaf shares the same
    leading (batch) dimension."""
    sizes = set()

    def visit(node):
        if isinstance(node, dict):
            for v in node.values():
                visit(v)
        else:
            arr = np.asarray(node)
            if arr.ndim >= 1:
                sizes.add(arr.shape[0])

    visit(state_dict)
    return len(sizes) <= 1


def check_joint_stuck(qpos_history, qvel_history,
                      pos_tol: float = 1e-4, vel_tol: float = 1e-3) -> bool:
    """gsworld_sapien_utils.py:446-459: joints commanded but not moving."""
    qp = np.asarray(qpos_history)
    qv = np.asarray(qvel_history)
    if len(qp) < 2:
        return False
    moved = np.abs(qp[-1] - qp[0]).max() > pos_tol
    moving = np.abs(qv).max() > vel_tol
    return (not moved) and (not moving)
