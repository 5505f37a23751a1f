"""Scripted task solutions: OBB-style grasp poses + phased pick-and-place.

Reference analog: motionplanning/{franka,xarm6}/solutions/*.py (e.g.
solveAlignFr3 at franka/solutions/align.py:19-123: compute grasp from the
object OBB, reach -> grasp -> lift -> place -> release).  Grasp geometry
here comes from the known collider dimensions instead of trimesh OBBs.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from gsworld_tpu.core.maths import quat_to_matrix
from gsworld_tpu.rollout.planner.motionplanner import (
    FR3UmiMotionPlanningSolver,
    XArmMotionPlanningSolver,
)


def build_grasp_quat(approaching, closing):
    """fr3_umi.py:186-196: columns (ortho, closing, approaching) -> wxyz."""
    import jax.numpy as jnp

    from gsworld_tpu.core.maths import matrix_to_quat
    approaching = np.asarray(approaching, np.float64)
    closing = np.asarray(closing, np.float64)
    ortho = np.cross(closing, approaching)
    R = np.stack([ortho, closing, approaching], axis=1)
    return np.asarray(matrix_to_quat(jnp.asarray(R)), np.float32)


TOPDOWN_Q = build_grasp_quat([0, 0, -1.0], [0, 1.0, 0])


def _actor_pos(env, name):
    base = env
    while hasattr(base, "env"):
        base = base.env
    return np.asarray(base.state.world.a_pos[0, base.actor_index[name]])


def pick_and_place(env, planner, obj_name: str, goal_pos,
                   grasp_z: float = 0.02, hover: float = 0.15,
                   place_hover: float = 0.12, release_z: float = 0.10):
    """reach -> descend -> grasp -> lift -> transport -> lower -> release."""
    obj = _actor_pos(env, obj_name)
    grasp = obj + np.array([0, 0, grasp_z], np.float32)
    res = planner.open_gripper(steps=3)
    if planner.move_to_pose_with_screw(grasp + [0, 0, hover], TOPDOWN_Q) == -1:
        return -1
    if planner.move_to_pose_with_screw(grasp, TOPDOWN_Q,
                                       refine_steps=6) == -1:
        return -1
    planner.close_gripper(steps=8)
    if planner.move_to_pose_with_screw(grasp + [0, 0, hover], TOPDOWN_Q,
                                       refine_steps=2) == -1:
        return -1
    goal = np.asarray(goal_pos, np.float32)
    if planner.move_to_pose_with_screw(
            goal + [0, 0, place_hover + hover * 0.5], TOPDOWN_Q) == -1:
        return -1
    if planner.move_to_pose_with_screw(goal + [0, 0, release_z], TOPDOWN_Q,
                                       refine_steps=4) == -1:
        return -1
    res = planner.open_gripper(steps=6)
    res = planner.move_to_pose_with_screw(goal + [0, 0, hover + 0.1],
                                          TOPDOWN_Q, refine_steps=4)
    res = planner.hold(steps=12)   # settle so static predicates can latch
    return res


def solveAlignFr3(env, seed=None, debug=False, vis=False):
    """franka/solutions/align.py:19-123: both cans into the spice rack."""
    env.reset(seed=seed)
    planner = FR3UmiMotionPlanningSolver(env, debug=debug, vis=vis)
    goal = _actor_pos(env, "spice_rack")
    res = -1
    for obj in ("dtc_green_can_fr3", "dtc_red_tomato_can_fr3"):
        res = pick_and_place(env, planner, obj, goal, grasp_z=0.03)
        if res == -1:
            return -1
    planner.close()
    return res


def solvePnpBoxFr3(env, seed=None, debug=False, vis=False):
    env.reset(seed=seed)
    planner = FR3UmiMotionPlanningSolver(env, debug=debug, vis=vis)
    goal = _actor_pos(env, "snack_box")
    res = pick_and_place(env, planner, "006_mustard_bottle", goal,
                         grasp_z=0.04, hover=0.18, release_z=0.14)
    planner.close()
    return res


def solveStackFr3(env, seed=None, debug=False, vis=False):
    env.reset(seed=seed)
    planner = FR3UmiMotionPlanningSolver(env, debug=debug, vis=vis)
    goal = _actor_pos(env, "005_tomato_soup_can")
    res = pick_and_place(env, planner, "dtc_red_tomato_can_fr3",
                         goal + [0, 0, 0.06], grasp_z=0.02, release_z=0.12)
    planner.close()
    return res


def solvePourMustardFr3(env, seed=None, debug=False, vis=False):
    """grasp the bottle, move above the bread box, tilt (pour)."""
    import jax.numpy as jnp

    from gsworld_tpu.core.maths import axis_angle_to_quat, quat_multiply
    env.reset(seed=seed)
    planner = FR3UmiMotionPlanningSolver(env, debug=debug, vis=vis)
    obj = _actor_pos(env, "006_mustard_bottle")
    goal = _actor_pos(env, "bread_slice")
    grasp = obj + np.array([0, 0, 0.04], np.float32)
    planner.open_gripper(steps=3)
    if planner.move_to_pose_with_screw(grasp + [0, 0, 0.15], TOPDOWN_Q) == -1:
        return -1
    if planner.move_to_pose_with_screw(grasp, TOPDOWN_Q) == -1:
        return -1
    planner.close_gripper(steps=8)
    if planner.move_to_pose_with_screw(grasp + [0, 0, 0.2], TOPDOWN_Q) == -1:
        return -1
    above = goal + np.array([0, 0, 0.25], np.float32)
    if planner.move_to_pose_with_screw(above, TOPDOWN_Q) == -1:
        return -1
    tilt_q = np.asarray(quat_multiply(
        axis_angle_to_quat(jnp.asarray([np.pi / 2.5, 0.0, 0.0])),
        jnp.asarray(TOPDOWN_Q)), np.float32)
    res = planner.move_to_pose_with_screw(above, tilt_q, refine_steps=8)
    planner.close()
    return res


def solveAlignXArm(env, seed=None, debug=False, vis=False):
    env.reset(seed=seed)
    planner = XArmMotionPlanningSolver(env, debug=debug, vis=vis)
    goal = _actor_pos(env, "005_tomato_soup_can")
    res = pick_and_place(env, planner, "dtc_green_can",
                         goal + [0.0, 0, 0.0], grasp_z=0.03)
    planner.close()
    return res


def solveBananaRotationXArm(env, seed=None, debug=False, vis=False):
    """grasp the banana, lift, yaw by -60 deg, set down, release
    (xarm6/solutions analog of rotate_banana init's grasp/rotate poses)."""
    import jax.numpy as jnp

    from gsworld_tpu.core.maths import axis_angle_to_quat, quat_multiply
    env.reset(seed=seed)
    planner = XArmMotionPlanningSolver(env, debug=debug, vis=vis)
    obj = _actor_pos(env, "011_banana")
    grasp = obj + np.array([0, 0, 0.005], np.float32)
    planner.open_gripper(steps=3)
    if planner.move_to_pose_with_screw(grasp + [0, 0, 0.12], TOPDOWN_Q) == -1:
        return -1
    if planner.move_to_pose_with_screw(grasp, TOPDOWN_Q) == -1:
        return -1
    planner.close_gripper(steps=8)
    if planner.move_to_pose_with_screw(grasp + [0, 0, 0.1], TOPDOWN_Q) == -1:
        return -1
    rot_q = np.asarray(quat_multiply(
        axis_angle_to_quat(jnp.asarray([0.0, 0.0, -np.pi / 3])),
        jnp.asarray(TOPDOWN_Q)), np.float32)
    if planner.move_to_pose_with_screw(grasp + [0, 0, 0.1], rot_q) == -1:
        return -1
    if planner.move_to_pose_with_screw(grasp + [0, 0, 0.03], rot_q) == -1:
        return -1
    res = planner.open_gripper(steps=6)
    res = planner.hold(steps=12)
    planner.close()
    return res


def solveSpoonOnBoardXArm(env, seed=None, debug=False, vis=False):
    env.reset(seed=seed)
    planner = XArmMotionPlanningSolver(env, debug=debug, vis=vis)
    from gsworld_tpu.envs.tasks.tabletop.xarm6.spoon_on_board import (
        BOARD_NAME,
        SPOON_NAME,
    )
    goal = _actor_pos(env, BOARD_NAME)
    res = pick_and_place(env, planner, SPOON_NAME, goal,
                         grasp_z=0.01, hover=0.12, release_z=0.06)
    planner.close()
    return res


SOLUTIONS = {
    "AlignFr3Env-v1": solveAlignFr3,
    "PnpBoxFr3Env-v1": solvePnpBoxFr3,
    "StackFr3Env-v1": solveStackFr3,
    "PourMustardFr3Env-v1": solvePourMustardFr3,
    "AlignXArmEnv-v1": solveAlignXArm,
    "BananaRotationXArmEnv-v1": solveBananaRotationXArm,
    "SpoonOnBoardXArmEnv-v1": solveSpoonOnBoardXArm,
}
