"""URDF parsing into a plain-data robot description.

Self-contained (xml.etree only). Produces :class:`RobotSpec`, the static
description the kinematics/dynamics layers compile against.  Robots used by
the shipped envs are pre-extracted to JSON+NPZ under
``gsworld_tpu/assets/robots/`` (see tools/extract_robot_specs.py) so the
framework needs no URDF files at runtime; this parser also serves the
real2sim pipeline for user robots (reference analog: SAPIEN's URDF loader
reached via mani_skill BaseAgent, e.g. fr3_umi.py:18).

Conventions: URDF origins are (xyz, rpy) with fixed-axis rolls:
R = Rz(yaw) @ Ry(pitch) @ Rx(roll).
"""

from __future__ import annotations

import dataclasses
import os
import xml.etree.ElementTree as ET
from typing import Dict, List, Optional, Tuple

import numpy as np

JOINT_FIXED = 0
JOINT_REVOLUTE = 1
JOINT_PRISMATIC = 2

_TYPE_MAP = {
    "fixed": JOINT_FIXED,
    "revolute": JOINT_REVOLUTE,
    "continuous": JOINT_REVOLUTE,
    "prismatic": JOINT_PRISMATIC,
}


def rpy_to_matrix(rpy) -> np.ndarray:
    r, p, y = float(rpy[0]), float(rpy[1]), float(rpy[2])
    cr, sr, cp, sp, cy, sy = np.cos(r), np.sin(r), np.cos(p), np.sin(p), np.cos(y), np.sin(y)
    Rx = np.array([[1, 0, 0], [0, cr, -sr], [0, sr, cr]])
    Ry = np.array([[cp, 0, sp], [0, 1, 0], [-sp, 0, cp]])
    Rz = np.array([[cy, -sy, 0], [sy, cy, 0], [0, 0, 1]])
    return Rz @ Ry @ Rx


def _origin(elem) -> Tuple[np.ndarray, np.ndarray]:
    if elem is None:
        return np.zeros(3), np.eye(3)
    xyz = np.fromstring(elem.get("xyz", "0 0 0"), sep=" ")
    rpy = np.fromstring(elem.get("rpy", "0 0 0"), sep=" ")
    return xyz, rpy_to_matrix(rpy)


@dataclasses.dataclass
class GeomSpec:
    kind: str                      # "mesh" | "box" | "cylinder" | "sphere" | "capsule" | "points"
    origin_pos: np.ndarray         # (3,) in link frame
    origin_rot: np.ndarray         # (3, 3)
    size: Optional[np.ndarray] = None      # box: full extents; cyl: [r, l]; sphere: [r]
    mesh_path: Optional[str] = None
    mesh_scale: Optional[np.ndarray] = None
    points: Optional[np.ndarray] = None    # "points": (K, 3) convex support pts (link frame)


@dataclasses.dataclass
class LinkSpec:
    name: str
    mass: float = 0.0
    com_pos: np.ndarray = dataclasses.field(default_factory=lambda: np.zeros(3))
    com_rot: np.ndarray = dataclasses.field(default_factory=lambda: np.eye(3))
    inertia: np.ndarray = dataclasses.field(default_factory=lambda: np.zeros((3, 3)))
    collisions: List[GeomSpec] = dataclasses.field(default_factory=list)
    visuals: List[GeomSpec] = dataclasses.field(default_factory=list)


@dataclasses.dataclass
class MimicSpec:
    joint: str
    multiplier: float = 1.0
    offset: float = 0.0


@dataclasses.dataclass
class JointSpec:
    name: str
    jtype: int
    parent: str
    child: str
    origin_pos: np.ndarray
    origin_rot: np.ndarray
    axis: np.ndarray
    limit_lower: float = -np.inf
    limit_upper: float = np.inf
    effort: float = np.inf
    velocity: float = np.inf
    damping: float = 0.0
    friction: float = 0.0
    mimic: Optional[MimicSpec] = None


@dataclasses.dataclass
class RobotSpec:
    name: str
    links: List[LinkSpec]
    joints: List[JointSpec]          # document order (matches SAPIEN qpos order)

    def link_index(self) -> Dict[str, int]:
        return {l.name: i for i, l in enumerate(self.links)}

    @property
    def movable_joints(self) -> List[JointSpec]:
        return [j for j in self.joints if j.jtype != JOINT_FIXED]

    @property
    def dof(self) -> int:
        return len(self.movable_joints)


def _parse_geom(elem, base_dir: str) -> Optional[GeomSpec]:
    pos, rot = _origin(elem.find("origin"))
    geo = elem.find("geometry")
    if geo is None:
        return None
    for child in geo:
        tag = child.tag
        if tag == "mesh":
            fn = child.get("filename", "")
            fn = fn.replace("package://", "")
            path = fn if os.path.isabs(fn) else os.path.normpath(os.path.join(base_dir, fn))
            scale = np.fromstring(child.get("scale", "1 1 1"), sep=" ")
            return GeomSpec("mesh", pos, rot, mesh_path=path, mesh_scale=scale)
        if tag == "box":
            return GeomSpec("box", pos, rot,
                            size=np.fromstring(child.get("size"), sep=" "))
        if tag == "cylinder":
            return GeomSpec("cylinder", pos, rot,
                            size=np.array([float(child.get("radius")),
                                           float(child.get("length"))]))
        if tag == "capsule":
            return GeomSpec("capsule", pos, rot,
                            size=np.array([float(child.get("radius")),
                                           float(child.get("length"))]))
        if tag == "sphere":
            return GeomSpec("sphere", pos, rot,
                            size=np.array([float(child.get("radius"))]))
    return None


def parse_urdf(path: str) -> RobotSpec:
    root = ET.parse(path).getroot()
    base_dir = os.path.dirname(os.path.abspath(path))

    links = []
    for le in root.findall("link"):
        link = LinkSpec(name=le.get("name"))
        inertial = le.find("inertial")
        if inertial is not None:
            link.com_pos, link.com_rot = _origin(inertial.find("origin"))
            m = inertial.find("mass")
            link.mass = float(m.get("value")) if m is not None else 0.0
            ine = inertial.find("inertia")
            if ine is not None:
                ixx = float(ine.get("ixx", 0)); iyy = float(ine.get("iyy", 0))
                izz = float(ine.get("izz", 0)); ixy = float(ine.get("ixy", 0))
                ixz = float(ine.get("ixz", 0)); iyz = float(ine.get("iyz", 0))
                link.inertia = np.array([[ixx, ixy, ixz],
                                         [ixy, iyy, iyz],
                                         [ixz, iyz, izz]])
        for ce in le.findall("collision"):
            g = _parse_geom(ce, base_dir)
            if g is not None:
                link.collisions.append(g)
        for ve in le.findall("visual"):
            g = _parse_geom(ve, base_dir)
            if g is not None:
                link.visuals.append(g)
        links.append(link)

    joints = []
    for je in root.findall("joint"):
        jtype = _TYPE_MAP.get(je.get("type"))
        if jtype is None:
            raise ValueError(f"unsupported joint type {je.get('type')!r}")
        pos, rot = _origin(je.find("origin"))
        ax = je.find("axis")
        axis = (np.fromstring(ax.get("xyz"), sep=" ") if ax is not None
                else np.array([1.0, 0, 0]))
        n = np.linalg.norm(axis)
        axis = axis / n if n > 0 else axis
        j = JointSpec(
            name=je.get("name"), jtype=jtype,
            parent=je.find("parent").get("link"),
            child=je.find("child").get("link"),
            origin_pos=pos, origin_rot=rot, axis=axis,
        )
        lim = je.find("limit")
        if lim is not None:
            if lim.get("lower") is not None:
                j.limit_lower = float(lim.get("lower"))
            if lim.get("upper") is not None:
                j.limit_upper = float(lim.get("upper"))
            if lim.get("effort") is not None:
                j.effort = float(lim.get("effort"))
            if lim.get("velocity") is not None:
                j.velocity = float(lim.get("velocity"))
        if je.get("type") == "continuous":
            j.limit_lower, j.limit_upper = -2 * np.pi, 2 * np.pi
        dyn = je.find("dynamics")
        if dyn is not None:
            j.damping = float(dyn.get("damping", 0))
            j.friction = float(dyn.get("friction", 0))
        mim = je.find("mimic")
        if mim is not None:
            j.mimic = MimicSpec(
                joint=mim.get("joint"),
                multiplier=float(mim.get("multiplier") or 1.0),
                offset=float(mim.get("offset") or 0.0),
            )
        joints.append(j)

    return RobotSpec(name=root.get("name", "robot"), links=links, joints=joints)
