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
    """Revolute serial chain: link i applies translation ``offsets[i]`` and
    optional fixed rotation ``link_quats[i]`` (both in the parent frame),
    then joint i rotates about ``axes[i]``. link_quats=None reproduces plain
    MJCF nested bodies (no static rotations); URDF-style chains (e.g. Panda,
    rpy per link) need them."""

    offsets: jnp.ndarray      # (J, 3) parent→joint translation
    axes: jnp.ndarray         # (J, 3) unit rotation axes
    base_pos: jnp.ndarray     # (3,)
    base_quat: jnp.ndarray    # (4,) wxyz
    tip_offset: jnp.ndarray   # (3,) last-frame → end-effector
    link_quats: jnp.ndarray | None = None  # (J, 4) fixed per-link rotations


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
        if chain.link_quats is not None:
            quat = rot.quat_mul(quat, chain.link_quats[j])
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


def geometric_jacobian(chain: JointChain, qpos: jnp.ndarray) -> jnp.ndarray:
    """Exact positional Jacobian of a revolute serial chain: column j is
    axis_j × (p_eef − p_j) (world-frame joint axis crossed with the moment
    arm). One FK pass, no autodiff — an order of magnitude smaller compile
    than jacfwd through the unrolled quaternion chain."""
    ps, qs = fk(chain, qpos)
    eef = ps[-1]
    cols = []
    for j in range(chain.axes.shape[0]):
        # the joint's own rotation leaves its axis invariant, so qs[j]
        # (which includes it) maps the local axis to world correctly
        axis_w = rot.quat_rotate(qs[j], chain.axes[j])
        cols.append(jnp.cross(axis_w, eef - ps[j]))
    return jnp.stack(cols, axis=-1)                  # (3, J)


def dls_ik_step(chain: JointChain, qpos: jnp.ndarray,
                target_pos: jnp.ndarray, damping: float = 0.05,
                lo: jnp.ndarray | None = None,
                hi: jnp.ndarray | None = None) -> jnp.ndarray:
    """One damped-least-squares IK step toward a Cartesian eef target.

    q' = q + J^T (J J^T + λ²I)⁻¹ (x* − x(q)) with the exact geometric
    Jacobian; the 3×3 solve is trivial. Used by the EE-space scripted experts
    (the reference drives a MuJoCo mocap body instead,
    envs/alohasim_ee_env.py:90-106 — same capability, solved in joint
    space)."""
    x, _ = eef_pose(chain, qpos)
    J = geometric_jacobian(chain, qpos)             # (3, J)
    err = target_pos - x
    A = J @ J.T + (damping ** 2) * jnp.eye(3)
    dq = J.T @ jnp.linalg.solve(A, err)
    q = qpos + dq
    if lo is not None:
        q = jnp.clip(q, lo, hi)
    return q


def viperx300s_chain(base_pos=(0.0, 0.0, 0.0), base_yaw: float = 0.0) -> JointChain:
    """ViperX-300s 6-DoF chain (waist, shoulder, elbow, forearm-roll,
    wrist-angle, wrist-rotate) with the exact MJCF link offsets/axes of the
    reference assets (envs/assets/vx300s_left.xml:3-35):

    base → shoulder_link (0,0,0.079) waist@z → upper_arm_link (0,0,0.04805)
    shoulder@y → upper_forearm_link (0.05955,0,0.3) elbow@y →
    lower_forearm_link (0.2,0,0) forearm_roll@x → wrist_link (0.1,0,0)
    wrist_angle@y → gripper_link (0.069744,0,0) wrist_rotate@x; the grasp
    point sits between the finger pads ≈ (0.112,0,0) in the gripper frame
    (finger links at 0.0687 + pad reach).
    """
    offsets = jnp.asarray([
        [0.0, 0.0, 0.079],
        [0.0, 0.0, 0.04805],
        [0.05955, 0.0, 0.3],
        [0.2, 0.0, 0.0],
        [0.1, 0.0, 0.0],
        [0.069744, 0.0, 0.0],
    ])
    axes = jnp.asarray([
        [0.0, 0.0, 1.0],   # waist
        [0.0, 1.0, 0.0],   # shoulder
        [0.0, 1.0, 0.0],   # elbow
        [1.0, 0.0, 0.0],   # forearm_roll
        [0.0, 1.0, 0.0],   # wrist_angle
        [1.0, 0.0, 0.0],   # wrist_rotate
    ])
    return JointChain(
        offsets=offsets, axes=axes,
        base_pos=jnp.asarray(base_pos, jnp.float32),
        base_quat=rot.axis_angle_to_quat(
            jnp.asarray([0.0, 0.0, base_yaw], jnp.float32)),
        tip_offset=jnp.asarray([0.112, 0.0, 0.0]))


# Joint limits: MJCF position-actuator ctrlranges (see envs/aloha_constants)
VIPERX_LO = jnp.asarray([-3.14158, -1.85005, -1.76278, -3.14158, -1.8675,
                         -3.14158])
VIPERX_HI = jnp.asarray([3.14158, 1.25664, 1.6057, 3.14158, 2.23402, 3.14158])
