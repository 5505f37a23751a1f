"""Tests for the Gaussian scene pytree, PLY I/O, merging and reposing."""

import json
import os

import numpy as np
import jax.numpy as jnp

from gsworld_tpu import constants
from gsworld_tpu.core import maths as M
from gsworld_tpu.gs import merge as gsmerge
from gsworld_tpu.gs import ply as plyio
from gsworld_tpu.gs import synthetic
from gsworld_tpu.gs.model import build_slot_ids, scene_from_splats
from gsworld_tpu.gs.transform import (
    SlotTransforms,
    identity_slots,
    repose_scene,
    transform_gaussians,
)


def _mat_to_quat_np(R):
    """Plain numpy rotation-matrix -> wxyz quat (trace branch is enough for
    the mild test rotations used here)."""
    w = np.sqrt(max(0.0, 1.0 + R[0, 0] + R[1, 1] + R[2, 2])) / 2.0
    x = (R[2, 1] - R[1, 2]) / (4 * w)
    y = (R[0, 2] - R[2, 0]) / (4 * w)
    z = (R[1, 0] - R[0, 1]) / (4 * w)
    return w, x, y, z


def small_scene(seed=0):
    return synthetic.make_tabletop_scene(
        seed=seed, n_background=500, n_per_link=50, n_per_object=80,
        link_labels={"base": 0, "fr3_link1": 2, "fr3_hand": [10, 14, 15]},
        object_labels={"dtc_green_can_fr3": 201, "dtc_red_tomato_can_fr3": 202},
    )


class TestPlyIO:
    def test_roundtrip(self, tmp_path):
        splats = small_scene()
        p = str(tmp_path / "scene.ply")
        plyio.save_splats_to_ply(splats, p)
        loaded = plyio.load_ply_to_splats(p)
        for k in ("means", "scales", "quats"):
            np.testing.assert_allclose(loaded[k], splats[k], atol=1e-6)
        np.testing.assert_allclose(
            loaded["shN"].reshape(-1, 45), splats["shN"].reshape(-1, 45), atol=1e-6)
        np.testing.assert_array_equal(loaded["semantics"], splats["semantics"])

    def test_semantics_optional(self, tmp_path):
        splats = small_scene()
        p = str(tmp_path / "nosem.ply")
        plyio.save_splats_to_ply(splats, p, with_semantics=False)
        loaded = plyio.load_ply_to_splats(p)
        assert (loaded["semantics"] == 0).all()


class TestSlotAssignment:
    def test_build_slot_ids(self):
        splats = small_scene()
        slot_ids, layout = build_slot_ids(
            splats["semantics"], constants.fr3_gs_semantics,
            link_names=["base", "fr3_link1", "fr3_hand"],
            object_labels={"dtc_green_can_fr3": 201, "dtc_red_tomato_can_fr3": 202},
        )
        assert layout.num_slots == 6  # static + 3 links + 2 objects
        # background (-1) stays slot 0
        assert (slot_ids[splats["semantics"] == -1] == 0).all()
        # multi-label link: all three labels map to the fr3_hand slot
        hand_slot = layout.slot_of("fr3_hand")
        for lab in (10, 14, 15):
            assert (slot_ids[splats["semantics"] == lab] == hand_slot).all()
        assert (slot_ids[splats["semantics"] == 201]
                == layout.object_slots["dtc_green_can_fr3"]).all()
        # scaled flags: links rigid, objects scaled
        assert not layout.scaled[hand_slot]
        assert layout.scaled[layout.object_slots["dtc_green_can_fr3"]]


class TestMerger:
    def test_merge_from_config(self, tmp_path):
        rng = np.random.default_rng(0)
        robot = synthetic.make_tabletop_scene(
            seed=1, n_background=300, n_per_link=40,
            link_labels={"base": 0, "fr3_link1": 2}, object_labels=None)
        can = synthetic.make_blob(rng, 100, [0.5, 0.1, 0.03], 0.03,
                                  [0.2, 0.7, 0.2], 0)
        plyio.save_splats_to_ply(robot, str(tmp_path / "robot.ply"))
        plyio.save_splats_to_ply(can, str(tmp_path / "can.ply"),
                                 with_semantics=False)
        cfg = {"models": [
            {"data_path": "robot.ply", "transformation": []},
            {"data_path": "can.ply", "semantic_labels": 201, "transformation": []},
        ]}
        cfg_path = tmp_path / "fr3_test.json"
        cfg_path.write_text(json.dumps(cfg))

        scene, layout = gsmerge.merge_scene_from_config(
            str(cfg_path), link_names=["base", "fr3_link1"],
            asset_dir=str(tmp_path))
        n = robot["means"].shape[0] + 100
        assert scene.num_gaussians == n
        # scalar label 201 resolves to dtc_green_can via obj_gs_semantics
        assert "dtc_green_can" in layout.object_slots
        sem = np.asarray(scene.semantics)
        assert (sem[-100:] == 201).all()


class TestTransformParity:
    """The repose math vs. a literal numpy port of the reference formulas
    (gs_utils.py:283-385)."""

    def _reference_transform(self, means, log_scales, quats, R, t, scale):
        # numpy re-derivation of the torch reference, scale -> rotate -> translate
        if scale is not None:
            means = means * scale
            x = np.exp(log_scales) * scale
            log_scales = np.log(x / (1 - x))
        means = means @ R.T
        # quat composition preserving norm
        w, x_, y, z = _mat_to_quat_np(R)
        qr = np.array([w, x_, y, z])
        norm = np.linalg.norm(quats, axis=-1, keepdims=True)
        nq = quats / norm
        out = np.stack([
            qr[0] * nq[:, 0] - qr[1] * nq[:, 1] - qr[2] * nq[:, 2] - qr[3] * nq[:, 3],
            qr[0] * nq[:, 1] + qr[1] * nq[:, 0] + qr[2] * nq[:, 3] - qr[3] * nq[:, 2],
            qr[0] * nq[:, 2] - qr[1] * nq[:, 3] + qr[2] * nq[:, 0] + qr[3] * nq[:, 1],
            qr[0] * nq[:, 3] + qr[1] * nq[:, 2] - qr[2] * nq[:, 1] + qr[3] * nq[:, 0],
        ], axis=-1) * norm
        means = means + t
        return means, log_scales, out

    def test_matches_reference_math(self):
        rng = np.random.default_rng(7)
        n = 200
        means = rng.normal(size=(n, 3)).astype(np.float32)
        log_scales = (-5 + 0.5 * rng.normal(size=(n, 3))).astype(np.float32)
        quats = rng.normal(size=(n, 4)).astype(np.float32)
        aa = np.array([0.3, -0.2, 0.5], np.float32)
        R = np.asarray(M.quat_to_matrix(M.axis_angle_to_quat(jnp.asarray(aa))))
        t = np.array([0.1, 0.2, -0.05], np.float32)
        scale = np.float32(0.93)

        got = transform_gaussians(
            jnp.asarray(means), jnp.asarray(log_scales), jnp.asarray(quats),
            jnp.zeros(n), R=jnp.asarray(R), t=jnp.asarray(t), scale=scale)
        want = self._reference_transform(means, log_scales, quats, R, t, scale)
        np.testing.assert_allclose(np.asarray(got[0]), want[0], atol=1e-5)
        np.testing.assert_allclose(np.asarray(got[1]), want[1], atol=1e-4)
        # quats equal up to global sign of the rotation quat
        q_got, q_want = np.asarray(got[2]), want[2]
        sign = np.sign(np.sum(q_got * q_want, axis=-1, keepdims=True))
        np.testing.assert_allclose(q_got * sign, q_want, atol=1e-5)

    def test_repose_scene_identity(self):
        splats = small_scene()
        slot_ids, layout = build_slot_ids(
            splats["semantics"], constants.fr3_gs_semantics,
            link_names=["base", "fr3_link1", "fr3_hand"],
            object_labels={"dtc_green_can_fr3": 201, "dtc_red_tomato_can_fr3": 202})
        scene = scene_from_splats(splats, slot_ids)
        slots = identity_slots(layout.num_slots, layout.scaled)
        posed = repose_scene(scene, slots)
        np.testing.assert_allclose(np.asarray(posed.means), splats["means"], atol=1e-6)
        # identity rotation leaves (normalized-then-rescaled) quats unchanged
        np.testing.assert_allclose(np.asarray(posed.quats), splats["quats"], atol=1e-5)
        # rigid slots keep log-scales exactly; scaled slots run the logit rule
        scaled_mask = np.asarray(layout.scaled)[slot_ids]
        np.testing.assert_allclose(
            np.asarray(posed.log_scales)[~scaled_mask],
            splats["scales"][~scaled_mask], atol=1e-6)
        x = np.exp(splats["scales"][scaled_mask])
        np.testing.assert_allclose(
            np.asarray(posed.log_scales)[scaled_mask],
            np.log(x / (1 - x)), atol=1e-4)

    def test_repose_scene_batched_moves_one_slot(self):
        splats = small_scene()
        slot_ids, layout = build_slot_ids(
            splats["semantics"], constants.fr3_gs_semantics,
            link_names=["base", "fr3_link1", "fr3_hand"],
            object_labels={"dtc_green_can_fr3": 201})
        scene = scene_from_splats(splats, slot_ids)
        B, S = 4, layout.num_slots
        base = identity_slots(S, layout.scaled, batch_shape=(B,))
        # translate the fr3_hand slot differently per env
        hand = layout.slot_of("fr3_hand")
        dt = np.zeros((B, S, 3), np.float32)
        dt[:, hand, 0] = np.arange(B)
        slots = SlotTransforms(R=base.R, t=jnp.asarray(dt), scale=base.scale,
                               apply_scale=base.apply_scale)
        posed = repose_scene(scene, slots)
        hand_mask = np.asarray(slot_ids == hand)
        for b in range(B):
            np.testing.assert_allclose(
                np.asarray(posed.means[b])[hand_mask, 0],
                splats["means"][hand_mask, 0] + b, atol=1e-5)
            # static gaussians untouched
            np.testing.assert_allclose(
                np.asarray(posed.means[b])[~hand_mask],
                splats["means"][~hand_mask], atol=1e-6)
