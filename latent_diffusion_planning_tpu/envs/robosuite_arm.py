"""Panda 7-DoF arm for the robosuite-side tasks (Lift / Can / Square).

The reference's robosuite envs drive a Franka Panda through an OSC_POSE
controller: the policy outputs end-effector deltas, robosuite solves them to
joint torques, and the observation surface carries joint + eef proprio
(envs/robosuite_env.py:142-170 assembles robot0_eef_pos/quat,
robot0_gripper_qpos, robot0_joint_pos...). Here the same capability is
built TPU-first: the URDF-exact Panda chain runs under the differentiable FK
of physics/kinematics.py, OSC deltas resolve through damped-least-squares IK
steps, and joints track with rate-limited servos — all pure jnp inside the
fused rollout scan.

The gripper is the physics core's two finger pads (force-based grasping,
envs/lift_physics.py); the arm supplies their frame.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..ops import rotations as rot
from .physics import kinematics as K


def _quat_x(angle: float) -> tuple:
    h = angle / 2.0
    return (math.cos(h), math.sin(h), 0.0, 0.0)


def panda_chain(base_pos=(-0.56, 0.0, 0.8)) -> K.JointChain:
    """Franka Panda kinematics (URDF link offsets + fixed rpy rotations).

    Joint translations/rotations from the public franka_description URDF;
    the tip offset spans flange (0,0,0.107) + hand to the grasp midpoint.
    Base sits behind the table like robosuite's mounted Panda.
    """
    offsets = jnp.asarray([
        [0.0, 0.0, 0.333],
        [0.0, 0.0, 0.0],
        [0.0, -0.316, 0.0],
        [0.0825, 0.0, 0.0],
        [-0.0825, 0.384, 0.0],
        [0.0, 0.0, 0.0],
        [0.088, 0.0, 0.0],
    ])
    link_quats = jnp.asarray([
        (1.0, 0.0, 0.0, 0.0),
        _quat_x(-math.pi / 2),
        _quat_x(math.pi / 2),
        _quat_x(math.pi / 2),
        _quat_x(-math.pi / 2),
        _quat_x(math.pi / 2),
        _quat_x(math.pi / 2),
    ])
    axes = jnp.tile(jnp.asarray([0.0, 0.0, 1.0]), (7, 1))
    return K.JointChain(
        offsets=offsets, axes=axes,
        base_pos=jnp.asarray(base_pos, jnp.float32),
        base_quat=rot.quat_identity(),
        tip_offset=jnp.asarray([0.0, 0.0, 0.21]),
        link_quats=link_quats)


PANDA_LO = jnp.asarray([-2.8973, -1.7628, -2.8973, -3.0718, -2.8973,
                        -0.0175, -2.8973])
PANDA_HI = jnp.asarray([2.8973, 1.7628, 2.8973, -0.0698, 2.8973,
                        3.7525, 2.8973])
# robosuite's Panda init_qpos (elbow-up ready pose over the table)
PANDA_HOME = jnp.asarray([0.0, 0.1963, 0.0, -2.6180, 0.0, 2.9416, 0.7854])

MAX_JOINT_DELTA = 0.15     # rad per control step (OSC output limiting)


def arm_track(chain: K.JointChain, qpos: jnp.ndarray,
              eef_target: jnp.ndarray, iters: int = 2) -> jnp.ndarray:
    """OSC-flavored tracking: IK-solve the Cartesian target, rate-limit."""
    q = qpos
    for _ in range(iters):
        q = K.dls_ik_step(chain, q, eef_target, damping=0.1,
                          lo=PANDA_LO, hi=PANDA_HI)
    dq = jnp.clip(q - qpos, -MAX_JOINT_DELTA, MAX_JOINT_DELTA)
    return jnp.clip(qpos + dq, PANDA_LO, PANDA_HI)
