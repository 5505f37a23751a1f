"""Contact generation between convex support-point colliders.

TPU-first collision scheme (SURVEY.md §2.3 row 5): every collider is a
static-size set of convex support points plus its convex-hull face planes.
Contact generation is fully dense/static-shaped:

  * points vs. plane      — exact for convex shapes;
  * points vs. hull faces — vertex-in-convex query: a point of A contributes
    a contact if it lies behind every face of B; the contact normal is the
    face of least penetration (the separating face), run in both directions
    for each pair.

Every candidate contact always exists as an array row; an ``active`` mask
selects the penetrating ones.  This trades FLOPs for compile-friendliness —
no dynamic shapes, no broadphase branches — and the pair lists are tiny
(tabletop scenes: a few actors, a few gripper links).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gsworld_tpu.core.maths import _einsum, quat_rotate, quat_to_matrix


def hull_faces(points: np.ndarray, max_faces: int = 64) -> np.ndarray:
    """Host-side: convex hull face planes (F, 4) as (nx, ny, nz, d) with
    n.x + d <= 0 inside; padded/truncated to max_faces (pad = far plane)."""
    from scipy.spatial import ConvexHull
    pts = np.asarray(points, np.float64)
    try:
        hull = ConvexHull(pts)
        eq = hull.equations  # (F, 4), n.x + d <= 0 inside
        # dedup near-identical faces
        eq = np.unique(eq.round(5), axis=0)
    except Exception:
        # degenerate (flat/small) collider: fall back to AABB faces
        lo, hi = pts.min(0), pts.max(0)
        eq = []
        for ax in range(3):
            n = np.zeros(3); n[ax] = 1.0
            eq.append(np.concatenate([n, [-hi[ax]]]))
            eq.append(np.concatenate([-n, [lo[ax]]]))
        eq = np.asarray(eq)
    if eq.shape[0] > max_faces:
        # keep the largest-offset spread; simple subsample is fine for pads
        idx = np.linspace(0, eq.shape[0] - 1, max_faces).astype(int)
        eq = eq[idx]
    pad = np.zeros((max_faces - eq.shape[0], 4))
    pad[:, 2] = 1.0
    pad[:, 3] = -1e9  # "far plane": never the separating face, never inside-
    return np.concatenate([eq, pad]).astype(np.float32)


class ContactSet(NamedTuple):
    """Fixed-size candidate contact rows (C is static).

    ``body_a``/``body_b`` index a unified body table (see world.py):
    robot links first, then actors; -1 = static environment.
    Normal points from B toward A (the direction A must move to separate).
    """

    pos: jnp.ndarray      # (C, 3) world contact point
    normal: jnp.ndarray   # (C, 3)
    pen: jnp.ndarray      # (C,) penetration depth (>0 when touching)
    body_a: jnp.ndarray   # (C,) int32
    body_b: jnp.ndarray   # (C,) int32
    friction: jnp.ndarray # (C,)
    active: jnp.ndarray   # (C,) bool


def transform_points(pos, quat, pts):
    """Body-frame points (K,3) -> world, pose (3,),(4,) broadcastable."""
    return quat_rotate(quat[..., None, :], pts) + pos[..., None, :]


def points_vs_plane(pts_w, plane):
    """pts_w (K, 3) vs a (bounded) plane.

    plane: (4,) = (n, d) with n.x + d = height above, or (8,) =
    (n, d, xmin, xmax, ymin, ymax) restricting contact to an xy region
    (bounded tabletop: objects slide off the edge, like the reference's
    finite table box, scene_builder_with_x_offset.py:35-45).
    Returns (pen (K,), normal (K, 3), pos (K, 3))."""
    n = plane[:3]
    h = pts_w @ n + plane[3]
    pen = -h
    if plane.shape[0] >= 8:
        inside = ((pts_w[:, 0] >= plane[4]) & (pts_w[:, 0] <= plane[5])
                  & (pts_w[:, 1] >= plane[6]) & (pts_w[:, 1] <= plane[7]))
        pen = jnp.where(inside, pen, -1.0)
    normal = jnp.broadcast_to(n, pts_w.shape)
    return pen, normal, pts_w


def points_vs_hull(pts_w, hull_pose_pos, hull_pose_quat, faces):
    """Points (K, 3) vs a convex hull with faces (F, 4) in the hull's body
    frame and world pose (pos, quat).

    Returns (pen (K,), normal_w (K, 3), pos (K, 3)): a point penetrates when
    it is behind all faces; depth = -max_f signed_dist; normal = the world
    normal of the least-penetrated (separating) face, pointing out of the
    hull."""
    Rh = quat_to_matrix(hull_pose_quat)
    local = _einsum("ji,kj->ki", Rh, pts_w - hull_pose_pos)  # R^T (p - t)
    sd = local @ faces[:, :3].T + faces[:, 3]                # (K, F)
    best = jnp.argmax(sd, axis=1)                            # separating face
    max_sd = jnp.take_along_axis(sd, best[:, None], axis=1)[:, 0]
    pen = -max_sd
    n_local = faces[best, :3]
    normal_w = _einsum("ij,kj->ki", Rh, n_local)
    return pen, normal_w, pts_w


def hull_query_sat(pts_w, hull_pose_pos, hull_pose_quat, faces,
                   margin: float = 0.0):
    """SAT building blocks for src points (K, 3) vs a dst hull.

    ``margin`` relaxes the inside test (speculative contacts, PhysX
    contactOffset): a point within ``margin`` of being behind every face
    counts, with its (negative) penetration reported faithfully.

    Per-point least-penetration normals (points_vs_hull) tilt with the
    dst hull's facets; on a gripper squeeze the two fingers' tilted
    normals open an escape direction outside the friction cone and the
    object squirts out (watermelon-seed failure, grasp contract tests in
    test_xarm_agent.py).  PhysX instead picks ONE separating-axis normal
    per colliding pair via face clipping; this returns the per-face SAT
    quantities so _generate_contacts can pick the minimal-depth axis
    across BOTH directed queries of a pair and share it among the pair's
    contact rows.

    Returns:
      inside (K,) bool — src point is behind every valid dst face
      depth  (F,)      — SAT depth of the deepest src point behind each
                         dst face (+big for padding faces)
      sd     (K, F)    — signed distance of each point to each face
      nrm_w  (F, 3)    — world-frame dst face normals
    """
    Rh = quat_to_matrix(hull_pose_quat)
    local = _einsum("ji,kj->ki", Rh, pts_w - hull_pose_pos)
    sd = local @ faces[:, :3].T + faces[:, 3]                # (K, F)
    valid = faces[:, 3] > -1e8                               # padding = far
    inside = jnp.max(jnp.where(valid[None, :], sd, -1.0), axis=1) < margin
    # mask the (1e7,)*3 padding rows of _pad_points out of the per-face
    # min: their huge |sd| otherwise poisons every face whose normal has
    # a negative dot with the pad direction (depth ~ +1e7), which can
    # hide the true minimal axis in vertex-face configurations
    pt_valid = jnp.max(jnp.abs(pts_w), axis=1) < 1e6         # (K,)
    sd_for_min = jnp.where(pt_valid[:, None], sd, 1e9)
    depth = jnp.where(valid, -jnp.min(sd_for_min, axis=0), 1e9)  # (F,)
    nrm_w = _einsum("ij,fj->fi", Rh, faces[:, :3])
    return inside, depth, sd, nrm_w


def reduce_patch(pen, pos, R: int, margin: float = 0.0):
    """PhysX-style contact-patch reduction: keep the deepest penetrating
    point, then greedily add the R-1 penetrating points farthest (max-min
    distance) from those already kept.  ``margin`` admits speculative
    points (pen > -margin) so near-touching vertices join the patch.

    Top-R-DEEPEST reduction collapses a long flat patch onto whichever
    rim is momentarily deepest: on a gripper squeeze every row lands on
    the object's top ring, the squeeze becomes a pure pinch at one height,
    and the unbalanced torque on the light object (DTC cans are 4 g with
    I ~ 7e-6) lets the velocity LCP satisfy non-penetration by spinning
    the object out of the grasp (measured: can COM kicked to 12 m/s in a
    single substep with deepest-only rows).  Spreading the rows along the
    patch, as PhysX's contact reduction does (deepest + extreme points),
    balances the torque and the squeeze holds.

    pen (..., K), pos (..., K, 3) -> (pen (..., R), idx (..., R)).
    Requires K >= R (never re-picks a point, so no duplicate active rows
    — duplicates break the Jacobi solver's mass splitting).
    """
    K = pen.shape[-1]
    NEG = jnp.float32(-1e9)
    valid = pen > -margin
    score0 = jnp.where(valid, pen, NEG + pen)
    i0 = jnp.argmax(score0, axis=-1)
    idxs = [i0]
    taken = jax.nn.one_hot(i0, K, dtype=jnp.bool_)
    p0 = jnp.take_along_axis(pos, i0[..., None, None], axis=-2)
    d2min = jnp.sum((pos - p0) ** 2, axis=-1)
    for _ in range(R - 1):
        s = jnp.where(taken, 2 * NEG,
                      jnp.where(valid, d2min, NEG + pen))
        j = jnp.argmax(s, axis=-1)
        idxs.append(j)
        taken = taken | jax.nn.one_hot(j, K, dtype=jnp.bool_)
        pj = jnp.take_along_axis(pos, j[..., None, None], axis=-2)
        d2min = jnp.minimum(d2min, jnp.sum((pos - pj) ** 2, axis=-1))
    idx = jnp.stack(idxs, axis=-1)                           # (..., R)
    return jnp.take_along_axis(pen, idx, axis=-1), idx


def concat_contacts(sets) -> ContactSet:
    return ContactSet(*[jnp.concatenate([getattr(s, f) for s in sets], axis=0)
                        for f in ContactSet._fields])
