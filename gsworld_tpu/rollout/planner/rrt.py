"""Joint-space RRT-Connect with collision checking.

Reference analog: mplib's RRTConnect planner used by
move_to_pose_with_RRTConnect (motionplanner.py:108-129).  TPU-native split:
the tree search runs on the host (tiny, branchy), while collision queries
batch through a jitted FK + convex point-in-hull check over all
(contact link, actor) pairs — many configurations are validated per device
call (edge checks test all interpolated waypoints at once).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp


def make_collision_checker(env, clearance: float = 0.002):
    """Returns check(qpos_batch (M, dof), a_pos, a_quat) -> (M,) bool
    (True = in collision). Collision = any contact-link support point
    penetrating any actor hull by more than ``clearance``, or below the
    tabletop plane."""
    from gsworld_tpu.physics import contact as C
    from gsworld_tpu.physics.kinematics import forward_kinematics

    scene = env.scene
    model = env.agent.model
    la = np.asarray(scene.la_pairs).reshape(-1, 2)
    links = sorted(set(int(l) for l, _ in la))
    planes = np.asarray(scene.planes)

    @jax.jit
    def check(qpos_batch, a_pos, a_quat, root_pos, root_quat):
        def one(q):
            lp, lq = forward_kinematics(model, q, root_pos, root_quat)
            pts = C.transform_points(
                lp, lq, jnp.asarray(scene.link_collision_pts))
            hit = jnp.zeros((), bool)
            for (l, a) in la:
                pen, _, _ = C.points_vs_hull(
                    pts[int(l)], a_pos[int(a)], a_quat[int(a)],
                    jnp.asarray(scene.actors.faces[int(a)]))
                hit = hit | jnp.any(pen > clearance)
            # gripper links below the tabletop plane = collision
            for l in links:
                h = pts[l] @ jnp.asarray(planes[0, :3]) + planes[0, 3]
                hit = hit | jnp.any(h < -clearance)
            return hit

        return jax.vmap(one)(qpos_batch)

    return check


def _edge_free(check, q0, q1, args, resolution=0.05):
    n = max(2, int(np.ceil(np.abs(q1 - q0).max() / resolution)) + 1)
    qs = q0[None] + (q1 - q0)[None] * np.linspace(0, 1, n)[:, None]
    return not bool(np.asarray(check(jnp.asarray(qs), *args)).any()), qs


def rrt_connect(env, q_start: np.ndarray, q_goal: np.ndarray,
                active_dofs, max_iters: int = 200, step: float = 0.3,
                resolution: float = 0.05, seed: int = 0,
                shortcut_iters: int = 30):
    """Plan a collision-free joint path (full-dof waypoints).

    Returns (T, dof) waypoints or None. Bidirectional RRT with straight-
    line connect attempts and shortcut smoothing (all host-side; collision
    queries batched on device)."""
    check = make_collision_checker(env)
    w = env.state.world
    args = (w.a_pos[0], w.a_quat[0], w.root_pos[0], w.root_quat[0])
    act = np.asarray(active_dofs)
    lo = env.agent.model.qlimits[act, 0]
    hi = env.agent.model.qlimits[act, 1]
    rng = np.random.default_rng(seed)

    def full(qa):
        q = np.array(q_start)
        q[act] = qa
        return q

    qa0 = q_start[act].astype(np.float64)
    qa1 = q_goal[act].astype(np.float64)
    if bool(np.asarray(check(jnp.asarray(full(qa1))[None], *args))[0]):
        return None                       # goal in collision

    # trivial straight line first (the common tabletop case)
    free, qs = _edge_free(check, full(qa0), full(qa1), args, resolution)
    if free:
        path = [qa0, qa1]
    else:
        trees = [[qa0], [qa1]]
        parents = [[-1], [-1]]
        path = None
        for it in range(max_iters):
            q_rand = rng.uniform(lo, hi)
            order = (0, 1) if it % 2 == 0 else (1, 0)
            ta, tb = order
            # extend tree A toward q_rand
            da = [np.linalg.norm(q - q_rand) for q in trees[ta]]
            ia = int(np.argmin(da))
            q_near = trees[ta][ia]
            d = q_rand - q_near
            q_new = q_near + d * min(1.0, step / max(np.linalg.norm(d), 1e-9))
            ok, _ = _edge_free(check, full(q_near), full(q_new), args,
                               resolution)
            if not ok:
                continue
            trees[ta].append(q_new)
            parents[ta].append(ia)
            # try connect tree B to q_new
            db = [np.linalg.norm(q - q_new) for q in trees[tb]]
            ib = int(np.argmin(db))
            ok, _ = _edge_free(check, full(trees[tb][ib]), full(q_new), args,
                               resolution)
            if ok:
                def backtrack(t, i):
                    out = []
                    while i >= 0:
                        out.append(trees[t][i])
                        i = parents[t][i]
                    return out
                pa = backtrack(ta, len(trees[ta]) - 1)[::-1]
                pb = backtrack(tb, ib)
                path = (pa + pb) if ta == 0 else (pb[::-1] + pa[::-1])
                break
        if path is None:
            return None

    # shortcut smoothing
    path = [np.asarray(p) for p in path]
    for _ in range(shortcut_iters):
        if len(path) <= 2:
            break
        i, j = sorted(rng.choice(len(path), 2, replace=False))
        if j - i < 2:
            continue
        ok, _ = _edge_free(check, full(path[i]), full(path[j]), args,
                           resolution)
        if ok:
            path = path[: i + 1] + path[j:]

    # densify to resolution for execution
    out = []
    for a, b in zip(path[:-1], path[1:]):
        n = max(2, int(np.ceil(np.abs(b - a).max() / resolution)) + 1)
        seg = a[None] + (b - a)[None] * np.linspace(0, 1, n)[:, None]
        out.append(seg[:-1])
    out.append(path[-1][None])
    qa_path = np.concatenate(out)
    return np.stack([full(qa) for qa in qa_path])
