"""Collision-mesh ingestion: real DTC/YCB-style assets upgrade actors from
primitive approximations with no code change (reference dtc.py:16-42)."""

import os

import numpy as np
import pytest

from gsworld_tpu.physics import builders as B
from gsworld_tpu.physics import meshes


def write_box_ply(path, h=0.05, binary=False):
    """Axis-aligned box as a PLY triangle mesh."""
    v = np.array([[sx * h, sy * h, sz * h]
                  for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)],
                 np.float32)
    quads = [(0, 1, 3, 2), (4, 6, 7, 5), (0, 4, 5, 1),
             (2, 3, 7, 6), (0, 2, 6, 4), (1, 5, 7, 3)]
    if binary:
        with open(path, "wb") as f:
            f.write(b"ply\nformat binary_little_endian 1.0\n")
            f.write(b"element vertex 8\n")
            f.write(b"property float x\nproperty float y\nproperty float z\n")
            f.write(b"element face 6\n")
            f.write(b"property list uchar int vertex_indices\n")
            f.write(b"end_header\n")
            f.write(v.astype("<f4").tobytes())
            for q in quads:
                f.write(np.uint8(4).tobytes()
                        + np.asarray(q, "<i4").tobytes())
    else:
        with open(path, "w") as f:
            f.write("ply\nformat ascii 1.0\n")
            f.write("element vertex 8\n")
            f.write("property float x\nproperty float y\nproperty float z\n")
            f.write("element face 6\n")
            f.write("property list uchar int vertex_indices\n")
            f.write("end_header\n")
            for p in v:
                f.write(f"{p[0]} {p[1]} {p[2]}\n")
            for q in quads:
                f.write("4 " + " ".join(map(str, q)) + "\n")
    return v


class TestMeshLoading:
    @pytest.mark.parametrize("binary", [False, True])
    def test_ply_box_roundtrip(self, tmp_path, binary):
        p = str(tmp_path / "box.ply")
        v = write_box_ply(p, binary=binary)
        verts, faces = meshes.load_mesh(p)
        assert verts.shape == (8, 3)
        np.testing.assert_allclose(verts, v, atol=1e-6)
        assert faces.shape == (12, 3)  # 6 quads fan-triangulated

    def test_obj_box(self, tmp_path):
        p = str(tmp_path / "tri.obj")
        open(p, "w").write("v 0 0 0\nv 1 0 0\nv 0 1 0\nf 1 2 3\n")
        verts, faces = meshes.load_mesh(p)
        assert verts.shape == (3, 3) and faces.shape == (1, 3)


class TestMassProperties:
    def test_box_hull_mass(self, tmp_path):
        p = str(tmp_path / "box.ply")
        write_box_ply(p, h=0.05)
        d = B.mesh_actor("box", p, density=10.0)
        # volume (0.1)^3 = 1e-3, mass = 1e-2
        assert d.mass == pytest.approx(1e-2, rel=1e-3)
        # box inertia: m/12 (a^2+b^2) with a=b=0.1
        expected = 1e-2 / 12 * 0.02
        np.testing.assert_allclose(np.diag(d.inertia), expected, rtol=1e-3)
        # support points centered on COM
        np.testing.assert_allclose(d.sup_pts.mean(0), 0.0, atol=1e-6)


class TestAssetUpgrade:
    def test_fallback_without_asset(self):
        fb = B.box_actor("no_such_asset", (0.01, 0.01, 0.01))
        assert B.actor_from_asset(fb) is fb

    def test_asset_replaces_primitive(self, tmp_path):
        coll = tmp_path / "collision"
        coll.mkdir()
        write_box_ply(str(coll / "dtc_test_obj.ply"), h=0.03)
        fb = B.cylinder_actor("dtc_test_obj", radius=0.01, half_length=0.01)
        up = B.actor_from_asset(fb, asset_dir=str(tmp_path))
        assert up is not fb
        assert up.mass == pytest.approx(10.0 * 0.06 ** 3, rel=1e-3)
        # hull support points span the box extent
        assert np.abs(up.sup_pts).max() == pytest.approx(0.03, rel=0.01)
