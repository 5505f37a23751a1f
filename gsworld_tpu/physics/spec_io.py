"""Robot-spec serialization: RobotSpec <-> JSON + NPZ.

Shipped robots are stored as compact extracted artifacts under
``gsworld_tpu/assets/robots/`` (<name>.json + <name>_geom.npz): the kinematic
/inertial data from the URDF, collision meshes reduced to convex support
point sets, and per-link surface point samples (for synthetic GS scenes and
the real2sim URDF->pcd tool).  Regenerate with tools/extract_robot_specs.py.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Dict, Optional

import numpy as np

from gsworld_tpu import constants
from gsworld_tpu.physics.urdf import GeomSpec, JointSpec, LinkSpec, MimicSpec, RobotSpec


def _geom_to_json(g: GeomSpec, npz: Dict[str, np.ndarray], key: str):
    d = {
        "kind": g.kind,
        "origin_pos": np.asarray(g.origin_pos).tolist(),
        "origin_rot": np.asarray(g.origin_rot).reshape(-1).tolist(),
    }
    if g.size is not None:
        d["size"] = np.asarray(g.size).tolist()
    if g.points is not None:
        npz[key] = np.asarray(g.points, np.float32)
        d["points_key"] = key
    return d


def _geom_from_json(d: dict, npz) -> GeomSpec:
    return GeomSpec(
        kind=d["kind"],
        origin_pos=np.asarray(d["origin_pos"]),
        origin_rot=np.asarray(d["origin_rot"]).reshape(3, 3),
        size=np.asarray(d["size"]) if "size" in d else None,
        points=np.asarray(npz[d["points_key"]]) if "points_key" in d else None,
    )


def save_robot_spec(spec: RobotSpec, out_dir: str,
                    surface_points: Optional[Dict[str, np.ndarray]] = None):
    """Write <name>.json + <name>_geom.npz. Mesh geoms must already be
    reduced to 'points' geoms (see tools/extract_robot_specs.py)."""
    npz: Dict[str, np.ndarray] = {}
    links_json = []
    for l in spec.links:
        lj = {
            "name": l.name, "mass": float(l.mass),
            "com_pos": np.asarray(l.com_pos).tolist(),
            "com_rot": np.asarray(l.com_rot).reshape(-1).tolist(),
            "inertia": np.asarray(l.inertia).reshape(-1).tolist(),
            "collisions": [_geom_to_json(g, npz, f"col/{l.name}/{i}")
                           for i, g in enumerate(l.collisions)],
        }
        links_json.append(lj)
    joints_json = []
    for j in spec.joints:
        jj = {
            "name": j.name, "type": int(j.jtype),
            "parent": j.parent, "child": j.child,
            "origin_pos": np.asarray(j.origin_pos).tolist(),
            "origin_rot": np.asarray(j.origin_rot).reshape(-1).tolist(),
            "axis": np.asarray(j.axis).tolist(),
            "limit": [float(j.limit_lower), float(j.limit_upper)],
            "effort": float(j.effort) if np.isfinite(j.effort) else None,
            "velocity": float(j.velocity) if np.isfinite(j.velocity) else None,
            "damping": float(j.damping), "friction": float(j.friction),
        }
        if j.mimic is not None:
            jj["mimic"] = {"joint": j.mimic.joint,
                           "multiplier": j.mimic.multiplier,
                           "offset": j.mimic.offset}
        joints_json.append(jj)
    if surface_points:
        for name, pts in surface_points.items():
            npz[f"surf/{name}"] = np.asarray(pts, np.float32)
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, f"{spec.name}.json"), "w") as f:
        json.dump({"name": spec.name, "links": links_json,
                   "joints": joints_json}, f, indent=1)
    np.savez_compressed(os.path.join(out_dir, f"{spec.name}_geom.npz"), **npz)


def load_robot_spec(name: str, spec_dir: Optional[str] = None) -> RobotSpec:
    """Load an extracted robot spec by name (plus surface points via
    :func:`load_surface_points`)."""
    spec_dir = spec_dir or constants.ROBOT_SPEC_DIR
    with open(os.path.join(spec_dir, f"{name}.json")) as f:
        data = json.load(f)
    npz = np.load(os.path.join(spec_dir, f"{name}_geom.npz"))
    links = []
    for lj in data["links"]:
        links.append(LinkSpec(
            name=lj["name"], mass=lj["mass"],
            com_pos=np.asarray(lj["com_pos"]),
            com_rot=np.asarray(lj["com_rot"]).reshape(3, 3),
            inertia=np.asarray(lj["inertia"]).reshape(3, 3),
            collisions=[_geom_from_json(g, npz) for g in lj["collisions"]],
        ))
    joints = []
    for jj in data["joints"]:
        j = JointSpec(
            name=jj["name"], jtype=jj["type"], parent=jj["parent"],
            child=jj["child"],
            origin_pos=np.asarray(jj["origin_pos"]),
            origin_rot=np.asarray(jj["origin_rot"]).reshape(3, 3),
            axis=np.asarray(jj["axis"]),
            limit_lower=jj["limit"][0], limit_upper=jj["limit"][1],
            effort=jj["effort"] if jj["effort"] is not None else np.inf,
            velocity=jj["velocity"] if jj["velocity"] is not None else np.inf,
            damping=jj["damping"], friction=jj["friction"],
        )
        if "mimic" in jj:
            j.mimic = MimicSpec(**jj["mimic"])
        joints.append(j)
    return RobotSpec(name=data["name"], links=links, joints=joints)


def load_surface_points(name: str, spec_dir: Optional[str] = None) -> Dict[str, np.ndarray]:
    spec_dir = spec_dir or constants.ROBOT_SPEC_DIR
    npz = np.load(os.path.join(spec_dir, f"{name}_geom.npz"))
    return {k[len("surf/"):]: npz[k] for k in npz.files if k.startswith("surf/")}
