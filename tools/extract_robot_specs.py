#!/usr/bin/env python
"""Extract compact robot specs from URDF + mesh source trees.

Reads robot description data (URDF XML + collision STL meshes), reduces every
collision mesh to a convex support point set and samples per-link surface
points, then writes self-contained JSON+NPZ artifacts into
``gsworld_tpu/assets/robots/``.  This keeps the framework free of runtime
URDF/mesh dependencies; re-run whenever the source descriptions change:

    python tools/extract_robot_specs.py --src <dir-with-robot-descriptions>

Default source is the GSWorld checkout mounted at /root/reference (robot
descriptions are measured data: kinematic parameters, inertials, mesh
geometry of real robots — same provenance as the calibration DB).
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from gsworld_tpu.physics import meshes
from gsworld_tpu.physics.spec_io import save_robot_spec
from gsworld_tpu.physics.urdf import GeomSpec, parse_urdf

ROBOTS = {
    # name -> urdf path relative to --src
    "fr3_umi": "gsworld/mani_skill/assets/robots/panda/fr3_umi.urdf",
    "fr3_umi_wrist435": "gsworld/mani_skill/assets/robots/panda/fr3_umi_wrist435.urdf",
    "fr3_umi_wrist435_cam_mount": "gsworld/mani_skill/assets/robots/panda/fr3_umi_wrist435_w_mount.urdf",
    "xarm6_uf_gripper": "gsworld/mani_skill/assets/robots/xarm6/xarm6_description/xarm6_uf_gripper.urdf",
    "xarm6_uf_gripper_wrist435": "gsworld/mani_skill/assets/robots/xarm6/xarm6_description/xarm6_uf_gripper_w_tcp_d435.urdf",
}

MAX_SUPPORT = 48
SURFACE_PTS = 2048


def reduce_link_collisions(link, max_support=MAX_SUPPORT):
    """Replace mesh collision geoms with convex support point sets
    (points already transformed into the link frame)."""
    new_cols = []
    surf_parts = []
    for g in link.collisions:
        if g.kind == "mesh":
            if not os.path.exists(g.mesh_path):
                print(f"  WARN missing mesh {g.mesh_path}; skipping")
                continue
            verts, faces = meshes.load_stl(g.mesh_path)
            scale = g.mesh_scale if g.mesh_scale is not None else np.ones(3)
            verts = verts * scale
            verts_link = verts @ g.origin_rot.T + g.origin_pos
            pts = meshes.convex_support_points(verts_link, max_support)
            new_cols.append(GeomSpec("points", np.zeros(3), np.eye(3),
                                     points=pts.astype(np.float32)))
            surf = meshes.sample_surface(verts_link,
                                         faces, SURFACE_PTS // max(1, len(link.collisions)))
            surf_parts.append(surf)
        else:
            new_cols.append(g)
            pts = meshes.primitive_points(g.kind, g.size)
            pts = pts @ g.origin_rot.T + g.origin_pos
            surf_parts.append(pts)
    link.collisions = new_cols
    if surf_parts:
        return np.concatenate(surf_parts).astype(np.float32)
    return None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/reference")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "..", "gsworld_tpu", "assets", "robots"))
    args = ap.parse_args()

    for name, rel in ROBOTS.items():
        path = os.path.join(args.src, rel)
        if not os.path.exists(path):
            print(f"SKIP {name}: {path} not found")
            continue
        print(f"== {name}")
        spec = parse_urdf(path)
        spec.name = name
        surface = {}
        for link in spec.links:
            surf = reduce_link_collisions(link)
            if surf is not None:
                surface[link.name] = surf
            nc = sum(g.points.shape[0] if g.points is not None else 1
                     for g in link.collisions) if link.collisions else 0
            print(f"  {link.name:28s} mass={link.mass:7.3f} support_pts={nc}")
        save_robot_spec(spec, args.out, surface)
        print(f"  -> {args.out}/{name}.json (+_geom.npz)")


if __name__ == "__main__":
    main()
