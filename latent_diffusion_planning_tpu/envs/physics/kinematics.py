"""Serial-chain forward kinematics + position-servo joint dynamics.

First layer of joint-space arm support on the physics core (ROADMAP item 1):
the reference's ALOHA actions are *joint position targets* for two 6-DoF
ViperX-300s arms plus normalized grippers (envs/alohasim_env.py:19-35,
position actuators with per-joint kp in the MJCF). This module provides:

- ``JointChain``: a static description of a revolute serial chain (per-joint
  rotation axis + fixed parent→child link transform),
- ``fk``: batched forward kinematics (positions + orientations of every link
  frame) as a small unrolled chain of quaternion ops — vmappable over envs
  and differentiable,
- ``servo_step``: first-order position-servo joint dynamics (rate-limited
  tracking of commanded targets, MuJoCo position-actuator flavor).

The chain constants below approximate the ViperX-300s from its public
dimensions (550 mm reach); exact MJCF import replaces them in a later round.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ...ops import rotations as rot


class JointChain(NamedTuple):
    """Revolute serial chain: joint i rotates about ``axes[i]`` (unit, in the
    parent frame after applying ``offsets[i]``)."""

    offsets: jnp.ndarray      # (J, 3) parent→joint translation
    axes: jnp.ndarray         # (J, 3) unit rotation axes
    base_pos: jnp.ndarray     # (3,)
    base_quat: jnp.ndarray    # (4,) wxyz
    tip_offset: jnp.ndarray   # (3,) last-frame → end-effector


def fk(chain: JointChain, qpos: jnp.ndarray):
    """Forward kinematics.

    qpos: (J,) joint angles → (positions (J+1, 3), quats (J+1, 4)) of every
    joint frame plus the end-effector frame (last row).
    """
    J = chain.axes.shape[0]
    pos = chain.base_pos
    quat = chain.base_quat
    positions = []
    quats = []
    for j in range(J):  # static small J — unrolled
        pos = pos + rot.quat_rotate(quat, chain.offsets[j])
        # quat_from_unit_axis keeps gradients finite at qpos = 0 (the
        # axis-angle norm is non-differentiable there)
        q_j = rot.quat_from_unit_axis(chain.axes[j], qpos[j])
        quat = rot.quat_mul(quat, q_j)
        positions.append(pos)
        quats.append(quat)
    tip = pos + rot.quat_rotate(quat, chain.tip_offset)
    positions.append(tip)
    quats.append(quat)
    return jnp.stack(positions), jnp.stack(quats)


def eef_pose(chain: JointChain, qpos: jnp.ndarray):
    """(eef position (3,), eef quat (4,))."""
    ps, qs = fk(chain, qpos)
    return ps[-1], qs[-1]


def servo_step(qpos: jnp.ndarray, target: jnp.ndarray, max_delta: float,
               lo: jnp.ndarray | None = None,
               hi: jnp.ndarray | None = None) -> jnp.ndarray:
    """Rate-limited position servo toward ``target`` (one control step).

    MuJoCo-position-actuator-flavored tracking: the joint moves toward the
    commanded target at most ``max_delta`` rad per step, clipped to limits.
    """
    q = qpos + jnp.clip(target - qpos, -max_delta, max_delta)
    if lo is not None:
        q = jnp.clip(q, lo, hi)
    return q


def viperx300s_chain(base_pos=(0.0, 0.0, 0.0), base_yaw: float = 0.0,
                     mirrored: bool = False) -> JointChain:
    """Approximate ViperX-300s 6-DoF chain (waist, shoulder, elbow,
    forearm-roll, wrist-pitch, wrist-roll). Public 550 mm-reach dimensions;
    exact MJCF values land with the asset importer."""
    sign = -1.0 if mirrored else 1.0
    offsets = jnp.asarray([
        [0.0, 0.0, 0.079],        # waist above base
        [0.0, 0.0, 0.048],        # shoulder
        [0.0, sign * 0.0, 0.30],  # upper arm → elbow
        [0.06, 0.0, 0.0],         # elbow offset
        [0.14, 0.0, 0.0],         # forearm → wrist pitch
        [0.07, 0.0, 0.0],         # wrist → roll
    ])
    axes = jnp.asarray([
        [0.0, 0.0, 1.0],   # waist yaw
        [0.0, 1.0, 0.0],   # shoulder pitch
        [0.0, 1.0, 0.0],   # elbow pitch
        [1.0, 0.0, 0.0],   # forearm roll
        [0.0, 1.0, 0.0],   # wrist pitch
        [1.0, 0.0, 0.0],   # wrist roll
    ])
    return JointChain(
        offsets=offsets, axes=axes,
        base_pos=jnp.asarray(base_pos, jnp.float32),
        base_quat=rot.axis_angle_to_quat(
            jnp.asarray([0.0, 0.0, base_yaw], jnp.float32)),
        tip_offset=jnp.asarray([0.1, 0.0, 0.0]))


# Joint limits approximating the ViperX-300s spec sheet (radians)
VIPERX_LO = jnp.asarray([-3.14, -1.85, -1.76, -3.14, -1.86, -3.14])
VIPERX_HI = jnp.asarray([3.14, 1.99, 1.60, 3.14, 2.23, 3.14])
