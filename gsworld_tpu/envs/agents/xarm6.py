"""XArm6 + UFactory gripper agent family (reference: gsworld/mani_skill/
agents/robots/xarm6/xarm6_uf_gripper.py).

Gains replicate xarm6_uf_gripper.py:124-131 (arm kp=1e4 kd=1e3 limit=100;
gripper kp=1e5 kd=2e3 limit=0.1).  The reference closes the 6-joint gripper
linkage with two SAPIEN point-to-point drives on precomputed anchors
(:420-510); in reduced coordinates the loop closure is equivalent to all
linkage joints following the drive joint one-to-one (the URDF axes encode
the signs), so here the passive joints are hard mimics of ``drive_joint`` /
``right_outer_knuckle_joint`` — validated by the finger-gap test
(tests/test_xarm_agent.py).  The active "finger" controller drives
(drive_joint, right_outer_knuckle_joint) with one action
(finger_mimic_pd_joint_pos, :325-345), absolute in [0, 0.85].
"""

from __future__ import annotations

import numpy as np

from gsworld_tpu.envs.agents.base import AgentSpec, register_agent
from gsworld_tpu.envs.controllers import CompositeController, JointGroupConfig
from gsworld_tpu.physics.kinematics import build_articulation
from gsworld_tpu.physics.spec_io import load_robot_spec
from gsworld_tpu.physics.urdf import MimicSpec

_PASSIVE = ("right_inner_knuckle_joint", "left_inner_knuckle_joint",
            "right_finger_joint", "left_finger_joint")


def _xarm_agent(uid: str) -> AgentSpec:
    spec = load_robot_spec(uid)
    # loop-closure -> mimic: passive linkage joints follow their side's
    # knuckle drive one-to-one
    by_name = {j.name: j for j in spec.joints}
    by_name["left_inner_knuckle_joint"].mimic = MimicSpec("drive_joint", 1.0)
    by_name["left_finger_joint"].mimic = MimicSpec("drive_joint", 1.0)
    by_name["right_inner_knuckle_joint"].mimic = MimicSpec(
        "right_outer_knuckle_joint", 1.0)
    by_name["right_finger_joint"].mimic = MimicSpec(
        "right_outer_knuckle_joint", 1.0)
    model = build_articulation(spec)

    arm_ids = tuple(model.dof_names.index(f"joint{i}") for i in range(1, 7))
    finger_ids = (model.dof_names.index("drive_joint"),
                  model.dof_names.index("right_outer_knuckle_joint"))

    arm_pd_joint_pos = JointGroupConfig(
        dof_ids=arm_ids, lower=None, upper=None, normalize_action=False,
        stiffness=1e4, damping=1e3, force_limit=100.0)
    arm_pd_joint_delta_pos = JointGroupConfig(
        dof_ids=arm_ids, lower=-0.1, upper=0.1, use_delta=True,
        normalize_action=True, stiffness=1e4, damping=1e3, force_limit=100.0)
    # one absolute action drives both knuckles (finger_mimic_pd_joint_pos);
    # force limit from the reference; mimics inherit via slaving
    finger_mimic = JointGroupConfig(
        dof_ids=finger_ids, lower=None, upper=None, mimic=True,
        normalize_action=False, stiffness=1e5, damping=2e3, force_limit=0.1)

    controllers = {
        "pd_joint_delta_pos": CompositeController(
            groups=(arm_pd_joint_delta_pos, finger_mimic), model=model),
        "pd_joint_pos": CompositeController(
            groups=(arm_pd_joint_pos, finger_mimic), model=model),
    }
    return AgentSpec(
        uid=uid, spec=spec, model=model, controllers=controllers,
        default_control_mode="pd_joint_delta_pos",
        ee_link="xarm_hand_tcp", base_link="link_base",
        finger_links=("left_finger", "right_finger"),
        contact_links=("left_finger", "right_finger",
                       "xarm_gripper_base_link"),
        arm_dof_ids=arm_ids, gripper_dof_ids=finger_ids,
        finger_friction=2.0,   # pads use a high-friction material (:20-32)
        finger_open_axes=((1, 1.0), (1, -1.0)),
    )


for _uid in ("xarm6_uf_gripper", "xarm6_uf_gripper_wrist435"):
    register_agent(_uid, lambda uid=_uid: _xarm_agent(uid))


UFGRIPPER_CLOSED_THRESHOLD = 0.1  # constants.py:5


def get_gripper_state(qpos, model) -> np.ndarray:
    """True = closed (drive_joint beyond threshold);
    xarm6_uf_gripper.py:576-580."""
    di = model.dof_names.index("drive_joint")
    return qpos[..., di] > UFGRIPPER_CLOSED_THRESHOLD
