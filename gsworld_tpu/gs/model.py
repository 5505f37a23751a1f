"""Gaussian scene representation: a structure-of-arrays pytree plus a static
slot layout that maps semantic labels to rigid-transform slots.

Design (TPU-first, see SURVEY.md §7.3 items 4/6): the reference rebuilds
boolean ``isin`` masks and deep-copies the full model every step
(gs_world_wrapper.py:242-265).  Here semantics are static per scene, so at
load time every Gaussian is assigned a *slot id* — an index into a small
per-step transform stack (slot 0 = static background/identity; one slot per
robot link; one per dynamic object).  Reposing then becomes a dense gather of
per-slot transforms, fully batched over envs inside jit, and the base scene
is never copied.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple, Union

import jax.numpy as jnp
import numpy as np
from flax import struct

SH_REST_COEFFS = 15  # degree-3 SH: (3+1)^2 - 1


@struct.dataclass
class GaussianScene:
    """SoA Gaussian scene pytree. N = number of Gaussians (static).

    Storage conventions match the PLY layout (gs/ply.py): ``log_scales`` in
    log space, ``logit_opacities`` in logit space, ``quats`` wxyz and not
    necessarily unit, ``shN`` flattened channel-major (N, 45).
    """

    means: jnp.ndarray            # (N, 3) f32
    sh0: jnp.ndarray              # (N, 3) f32  (DC coefficients per channel)
    shN: jnp.ndarray              # (N, 45) f32 (channel-major [ch][coeff])
    log_scales: jnp.ndarray       # (N, 3) f32
    quats: jnp.ndarray            # (N, 4) f32 wxyz
    logit_opacities: jnp.ndarray  # (N,) f32
    semantics: jnp.ndarray        # (N,) i32
    slot_ids: jnp.ndarray         # (N,) i32 index into transform stack

    @property
    def num_gaussians(self) -> int:
        return self.means.shape[0]


@dataclasses.dataclass(frozen=True)
class SlotLayout:
    """Static mapping from named movable parts to transform-stack slots.

    slot 0 is always the identity/static slot. ``scaled`` marks slots whose
    repose path applies uniform scaling via the reference's
    ``inverse_sigmoid(exp(s)*k)`` rule (object slots), vs. pure rigid motion
    (robot-link slots) — see gs_world_wrapper.py:110-162.
    """

    names: Tuple[str, ...]          # names[i] = name of slot i ("" for static)
    scaled: Tuple[bool, ...]        # scaled[i]
    link_slots: Tuple[int, ...]     # slots driven by robot link poses, in link order
    object_slots: Dict[str, int]    # actor name -> slot

    @property
    def num_slots(self) -> int:
        return len(self.names)

    def slot_of(self, name: str) -> int:
        return self.names.index(name)


def _labels_of(entry: Union[int, Sequence[int]]) -> List[int]:
    return list(entry) if isinstance(entry, (list, tuple)) else [int(entry)]


def build_slot_ids(
    semantics: np.ndarray,
    gs_semantics: Dict[str, Union[int, Sequence[int]]],
    link_names: Sequence[str],
    object_labels: Dict[str, int],
) -> Tuple[np.ndarray, SlotLayout]:
    """Assign a transform slot to every Gaussian from its semantic label.

    Args:
      semantics: (N,) integer labels.
      gs_semantics: per-robot link-name -> label(s) map (constants.py).
      link_names: robot link names in FK order; each gets one slot.
      object_labels: actor name -> object semantic label (obj_gs_semantics).

    Returns (slot_ids (N,) int32, SlotLayout). Labels not claimed by any link
    or object stay in slot 0 (static background; includes label -1).
    """
    semantics = np.asarray(semantics, np.int32)
    names: List[str] = [""]
    scaled: List[bool] = [False]
    slot_ids = np.zeros(semantics.shape[0], np.int32)

    link_slots: List[int] = []
    for link in link_names:
        slot = len(names)
        names.append(link)
        scaled.append(False)
        link_slots.append(slot)
        if link in gs_semantics:
            labels = _labels_of(gs_semantics[link])
            mask = np.isin(semantics, np.asarray(labels, np.int32))
            slot_ids[mask] = slot

    object_slots: Dict[str, int] = {}
    for actor, label in object_labels.items():
        slot = len(names)
        names.append(actor)
        scaled.append(True)
        object_slots[actor] = slot
        slot_ids[semantics == np.int32(label)] = slot

    layout = SlotLayout(
        names=tuple(names),
        scaled=tuple(scaled),
        link_slots=tuple(link_slots),
        object_slots=object_slots,
    )
    return slot_ids, layout


def scene_from_splats(splats: Dict[str, np.ndarray],
                      slot_ids: Optional[np.ndarray] = None) -> GaussianScene:
    """Build a GaussianScene from a splat dict (see gs/ply.py layouts)."""
    n = splats["means"].shape[0]
    if slot_ids is None:
        slot_ids = np.zeros(n, np.int32)
    return GaussianScene(
        means=jnp.asarray(splats["means"], jnp.float32),
        sh0=jnp.asarray(np.reshape(splats["sh0"], (n, 3)), jnp.float32),
        shN=jnp.asarray(np.reshape(splats["shN"], (n, 45)), jnp.float32),
        log_scales=jnp.asarray(splats["scales"], jnp.float32),
        quats=jnp.asarray(splats["quats"], jnp.float32),
        logit_opacities=jnp.asarray(np.reshape(splats["opacities"], (n,)), jnp.float32),
        semantics=jnp.asarray(splats["semantics"], jnp.int32),
        slot_ids=jnp.asarray(slot_ids, jnp.int32),
    )


def scene_to_splats(scene: GaussianScene) -> Dict[str, np.ndarray]:
    n = scene.num_gaussians
    return {
        "means": np.asarray(scene.means),
        "sh0": np.asarray(scene.sh0).reshape(n, 3, 1),
        "shN": np.asarray(scene.shN).reshape(n, 3, 15),
        "scales": np.asarray(scene.log_scales),
        "quats": np.asarray(scene.quats),
        "opacities": np.asarray(scene.logit_opacities).reshape(n, 1),
        "semantics": np.asarray(scene.semantics),
    }


def concatenate_scenes(scenes: Sequence[GaussianScene]) -> GaussianScene:
    """Merge scenes by concatenation (order preserved), mirroring
    GaussianModelMerger.merge_models (gaussian_merger.py:213-274)."""
    cat = lambda attr: jnp.concatenate([getattr(s, attr) for s in scenes], axis=0)
    return GaussianScene(
        means=cat("means"), sh0=cat("sh0"), shN=cat("shN"),
        log_scales=cat("log_scales"), quats=cat("quats"),
        logit_opacities=cat("logit_opacities"), semantics=cat("semantics"),
        slot_ids=cat("slot_ids"),
    )
