"""Device-resident Can (pick-place) and Square (nut assembly) tasks.

Batched on-device counterparts of the reference's other two robosuite tasks
(SURVEY.md §6, BASELINE.md: rm_can, rm_square — robosuite PickPlaceCan and
NutAssemblySquare wrapped by envs/robosuite_env.py):

- **CanEnv**: pick the can from the source region and place it into the
  target bin; success = can inside the bin region resting on its floor
  (robosuite `_check_success` semantics: object in the right bin).
- **SquareEnv**: pick the square nut and drop it over the square peg;
  success = nut centered on the peg below its top (robosuite: nut on peg).

Both run the Panda 7-DoF arm (envs/robosuite_arm.py): OSC-style delta-eef
actions resolve through IK + rate-limited joint servos over the URDF-exact
chain, robot0_eef_pos/quat come from forward kinematics and
robot0_joint_pos is true joint state (parity: robosuite's OSC_POSE Panda).
Object interaction is kinematic grasp attachment (the force-based contact
variant follows the lift_physics.py pattern); obs-key surface (robot0_* +
object + agentview_image), seeded randomized resets, and scripted waypoint
experts for self-contained demo generation.
"""

from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp

from ..ops import render as R
from ..ops import rotations as rot
from . import robosuite_arm as ra
from .aloha_base import _link_frame
from .lift import (CUBE_HALF, EEF_SPEED, GRIPPER_SPEED, GRASP_RADIUS,
                   GRAVITY_DZ, TABLE_Z, WORK_HI, WORK_LO)
from .physics import kinematics as K

PANDA_CHAIN = ra.panda_chain(base_pos=(-0.56, 0.0, TABLE_Z))


class PickPlaceState(flax.struct.PyTreeNode):
    qpos: jnp.ndarray          # (7,) Panda joints
    eef_target: jnp.ndarray    # integrated OSC Cartesian target
    gripper: jnp.ndarray
    obj_pos: jnp.ndarray
    obj_yaw: jnp.ndarray       # () spawn yaw (kinematic attach: constant)
    grasped: jnp.ndarray
    t: jnp.ndarray

    @property
    def eef_pos(self) -> jnp.ndarray:
        return K.eef_pose(PANDA_CHAIN, self.qpos)[0]


class _PickPlaceBase:
    """Shared kinematic pick-and-place machinery."""

    obs_keys = ("robot0_eef_pos", "robot0_eef_quat", "robot0_gripper_qpos",
                "object", "agentview_image")
    action_dim = 7
    episode_len = 400
    max_reward = 1.0

    # subclasses set these
    spawn_lo: jnp.ndarray
    spawn_hi: jnp.ndarray
    obj_half: float
    obj_color: tuple

    def __init__(self, image_size: int = 64, render_images: bool = True,
                 episode_len: int = 400, renderer: str = "xla"):
        self.image_size = image_size
        self.render_images = render_images
        self.episode_len = episode_len
        self.renderer = renderer
        self.camera = R.look_at(pos=(0.55, 0.0, 1.25),
                                lookat=(0.0, 0.0, TABLE_Z + 0.05))

    def reset(self, rng: jax.Array):
        xy_rng, yaw_rng = jax.random.split(rng)
        xy = jax.random.uniform(xy_rng, (2,), minval=self.spawn_lo,
                                maxval=self.spawn_hi)
        yaw = jax.random.uniform(yaw_rng, (), minval=-jnp.pi / 6,
                                 maxval=jnp.pi / 6)
        eef = jnp.asarray([0.0, 0.0, TABLE_Z + 0.25])
        qpos = ra.PANDA_HOME
        for _ in range(8):  # settle the home pose onto the start target
            qpos = ra.arm_track(PANDA_CHAIN, qpos, eef)
        state = PickPlaceState(
            qpos=qpos, eef_target=eef,
            gripper=jnp.ones(()),
            obj_pos=jnp.concatenate([xy, jnp.asarray([self.rest_z()])]),
            obj_yaw=yaw,
            grasped=jnp.zeros((), bool),
            t=jnp.zeros((), jnp.int32))
        return state, self.obs(state)

    def rest_z(self) -> float:
        return TABLE_Z + self.obj_half

    def step(self, state: PickPlaceState, action: jnp.ndarray):
        action = jnp.clip(action, -1.0, 1.0)
        eef_target = jnp.clip(state.eef_target + action[:3] * EEF_SPEED,
                              WORK_LO, WORK_HI)
        qpos = ra.arm_track(PANDA_CHAIN, state.qpos, eef_target)
        eef, _ = K.eef_pose(PANDA_CHAIN, qpos)
        target = jnp.where(action[6] > 0, 0.0, 1.0)
        grip = state.gripper + jnp.clip(target - state.gripper,
                                        -GRIPPER_SPEED, GRIPPER_SPEED)
        near = jnp.linalg.norm(state.obj_pos - eef) < GRASP_RADIUS
        closing = grip < 0.4
        grasped = jnp.where(state.grasped, closing, near & closing)
        free_z = jnp.maximum(state.obj_pos[2] - GRAVITY_DZ,
                             self.min_free_z(state.obj_pos))
        obj = jnp.where(grasped, eef, state.obj_pos.at[2].set(free_z))
        new_state = PickPlaceState(qpos=qpos, eef_target=eef_target,
                                   gripper=grip, obj_pos=obj,
                                   obj_yaw=state.obj_yaw,
                                   grasped=grasped, t=state.t + 1)
        success = self.check_success(new_state)
        dist = jnp.linalg.norm(obj - eef)
        reach = 1.0 - jnp.tanh(10.0 * dist)
        reward = jnp.where(success, 1.0,
                           0.25 * reach + jnp.where(grasped, 0.25, 0.0))
        return new_state, self.obs(new_state), reward, success

    def min_free_z(self, obj_pos: jnp.ndarray) -> jnp.ndarray:
        return jnp.asarray(self.rest_z())

    def obs(self, state: PickPlaceState) -> dict:
        gripper_q = jnp.asarray([0.020 + 0.024 * state.gripper,
                                 -0.020 - 0.024 * state.gripper])
        eef, eef_quat = K.eef_pose(PANDA_CHAIN, state.qpos)
        # object-state layout parity with robosuite PickPlaceCan /
        # NutAssemblySquare single-object mode (14-dim: obj_pos, obj_quat
        # xyzw, obj_to_eef_pos, obj_to_eef_quat xyzw — the observable
        # robomimic can/square HDF5s record, envs/robosuite_env.py
        # get_observation "object" ← di["object-state"]); quats are xyzw
        half_yaw = state.obj_yaw / 2.0
        obj_quat = jnp.asarray([jnp.cos(half_yaw), 0.0, 0.0,
                                jnp.sin(half_yaw)])
        rel_quat = rot.quat_mul(obj_quat, rot.quat_conj(eef_quat))
        obs = {
            "robot0_eef_pos": eef,
            "robot0_eef_quat": rot.quat_wxyz_to_xyzw(eef_quat),
            "robot0_joint_pos": state.qpos,
            "robot0_gripper_qpos": gripper_q,
            "object": jnp.concatenate([
                state.obj_pos, rot.quat_wxyz_to_xyzw(obj_quat),
                state.obj_pos - eef, rot.quat_wxyz_to_xyzw(rel_quat)]),
        }
        if self.render_images:
            obs["agentview_image"] = self.render(state)
        return obs

    def get_state(self, state):
        return state

    def reset_to(self, state):
        """Deterministic state-injection reset (parity: the reference's
        reset_to replay, envs/robosuite_env.py:88-120) — envs are pure
        functions of their state pytree, so injecting a recorded state IS
        the reset; the paired obs comes from the same pure obs map."""
        return state, self.obs(state)


    # ------------------------------------------------------------------
    def scripted_action(self, state: PickPlaceState,
                        rng: jax.Array | None = None,
                        noise: float = 0.0) -> jnp.ndarray:
        obj = state.obj_pos
        goal = self.goal_pos()
        over_goal = jnp.linalg.norm(obj[:2] - goal[:2]) < 0.01

        above_obj = obj + jnp.asarray([0.0, 0.0, 0.08])
        carry_z = TABLE_Z + 0.18
        above_goal = goal.at[2].set(carry_z)
        lower_goal = goal + jnp.asarray([0.0, 0.0, self.drop_height()])

        xy_near = jnp.linalg.norm(obj[:2] - state.eef_pos[:2]) < 0.01
        z_near = jnp.abs(obj[2] - state.eef_pos[2]) < 0.012

        # not grasped: reach above → descend → close
        reach_target = jnp.where(xy_near, obj, above_obj)
        # grasped: go above goal, then lower, then release
        low = jnp.abs(state.eef_pos[2] - lower_goal[2]) < 0.02
        carry_target = jnp.where(over_goal, lower_goal, above_goal)
        target = jnp.where(state.grasped, carry_target, reach_target)
        delta = jnp.clip((target - state.eef_pos) / EEF_SPEED, -1.0, 1.0)
        release = state.grasped & over_goal & low
        close = jnp.where(release, -1.0,
                          jnp.where(state.grasped | (xy_near & z_near),
                                    1.0, -1.0))
        act = jnp.concatenate([delta, jnp.zeros(3), close[None]])
        if noise > 0.0 and rng is not None:
            act = act + noise * jax.random.normal(rng, act.shape)
        return jnp.clip(act, -1.0, 1.0)

    # subclass hooks ----------------------------------------------------
    def goal_pos(self) -> jnp.ndarray:
        raise NotImplementedError

    def goal_xy(self) -> jnp.ndarray:
        return self.goal_pos()[:2]

    def drop_height(self) -> float:
        raise NotImplementedError

    def check_success(self, state: PickPlaceState) -> jnp.ndarray:
        raise NotImplementedError


def _arm_links(qpos: jnp.ndarray):
    """3 grey boxes tracing the Panda for the ray-cast renderer."""
    ps, _ = K.fk(PANDA_CHAIN, qpos)
    segs = [(ps[1], ps[3], 0.045), (ps[3], ps[5], 0.035), (ps[5], ps[7], 0.03)]
    pos, rots, sizes = [], [], []
    for p0, p1, w in segs:
        c, m, h = _link_frame(p0, p1, w)
        pos.append(c), rots.append(m), sizes.append(h)
    return jnp.stack(pos), jnp.stack(rots), jnp.stack(sizes)


BIN_CENTER = jnp.asarray([0.17, 0.15, TABLE_Z])
BIN_HALF = 0.055
BIN_WALL_H = 0.03


class CanEnv(_PickPlaceBase):
    """Pick the can and place it in the bin (robosuite PickPlaceCan parity)."""

    spawn_lo = jnp.asarray([-0.12, -0.18])
    spawn_hi = jnp.asarray([0.02, -0.02])
    obj_half = 0.025
    obj_color = (0.8, 0.25, 0.2)

    def goal_pos(self) -> jnp.ndarray:
        return BIN_CENTER + jnp.asarray([0.0, 0.0, self.obj_half + 0.06])

    def drop_height(self) -> float:
        return 0.09

    def check_success(self, state: PickPlaceState) -> jnp.ndarray:
        o = state.obj_pos
        in_bin_xy = jnp.all(jnp.abs(o[:2] - BIN_CENTER[:2]) < BIN_HALF)
        settled = o[2] < TABLE_Z + self.obj_half + 0.02
        return in_bin_xy & settled & ~state.grasped

    def render(self, state: PickPlaceState) -> jnp.ndarray:
        lp, lr, ls = _arm_links(state.qpos)
        scene = R.Scene(
            pos=jnp.concatenate([jnp.stack([
                state.obj_pos,
                BIN_CENTER + jnp.asarray([0.0, -BIN_HALF, BIN_WALL_H / 2]),
                BIN_CENTER + jnp.asarray([0.0, BIN_HALF, BIN_WALL_H / 2]),
                BIN_CENTER + jnp.asarray([-BIN_HALF, 0.0, BIN_WALL_H / 2]),
                BIN_CENTER + jnp.asarray([BIN_HALF, 0.0, BIN_WALL_H / 2]),
            ]), lp]),
            rot=jnp.concatenate([jnp.stack([jnp.eye(3)] * 5), lr]),
            size=jnp.concatenate([jnp.stack([
                jnp.asarray([self.obj_half, self.obj_half, self.obj_half]),
                jnp.asarray([BIN_HALF, 0.005, BIN_WALL_H / 2]),
                jnp.asarray([BIN_HALF, 0.005, BIN_WALL_H / 2]),
                jnp.asarray([0.005, BIN_HALF, BIN_WALL_H / 2]),
                jnp.asarray([0.005, BIN_HALF, BIN_WALL_H / 2]),
            ]), ls]),
            color=jnp.asarray([list(self.obj_color),
                               [0.55, 0.45, 0.25], [0.55, 0.45, 0.25],
                               [0.55, 0.45, 0.25], [0.55, 0.45, 0.25],
                               [0.65, 0.65, 0.7], [0.6, 0.6, 0.68],
                               [0.55, 0.55, 0.65]]),
            kind=jnp.zeros((8,), jnp.int32),
            plane_z=jnp.asarray(TABLE_Z, jnp.float32))
        return R.render_scene(scene, self.camera, self.image_size,
                              self.image_size, backend=self.renderer)


PEG_X = 0.12    # python floats: the peg site is static geometry, and any
PEG_Y = 0.12    # float() of a jnp constant inside a jit trace stages into
                # the trace under omnistaging and raises ConcretizationError
PEG_POS = jnp.asarray([PEG_X, PEG_Y, TABLE_Z])
PEG_HALF_XY = 0.012
PEG_HALF_Z = 0.05   # python float: used in static expressions under trace
PEG_HALF = jnp.asarray([PEG_HALF_XY, PEG_HALF_XY, PEG_HALF_Z])
NUT_TOL = 0.02


class SquareEnv(_PickPlaceBase):
    """Place the square nut over the peg (robosuite NutAssemblySquare parity)."""

    spawn_lo = jnp.asarray([-0.13, -0.15])
    spawn_hi = jnp.asarray([-0.01, 0.0])
    obj_half = 0.02
    obj_color = (0.75, 0.65, 0.15)

    def goal_pos(self) -> jnp.ndarray:
        return PEG_POS + jnp.asarray([0.0, 0.0, 2 * PEG_HALF_Z + 0.02])

    def drop_height(self) -> float:
        return 2 * PEG_HALF_Z + 0.035

    def min_free_z(self, obj_pos: jnp.ndarray) -> jnp.ndarray:
        # the nut slides down the peg when aligned; otherwise rests on table
        on_peg = jnp.all(jnp.abs(obj_pos[:2] - PEG_POS[:2]) < NUT_TOL)
        return jnp.where(on_peg, TABLE_Z + 0.008, TABLE_Z + self.obj_half)

    def check_success(self, state: PickPlaceState) -> jnp.ndarray:
        o = state.obj_pos
        aligned = jnp.all(jnp.abs(o[:2] - PEG_POS[:2]) < NUT_TOL)
        below_top = o[2] < PEG_POS[2] + 2 * PEG_HALF_Z - 0.01
        return aligned & below_top & ~state.grasped

    def render(self, state: PickPlaceState) -> jnp.ndarray:
        lp, lr, ls = _arm_links(state.qpos)
        scene = R.Scene(
            pos=jnp.concatenate([jnp.stack([
                state.obj_pos,
                PEG_POS + jnp.asarray([0.0, 0.0, PEG_HALF[2]]),
            ]), lp]),
            rot=jnp.concatenate([jnp.stack([jnp.eye(3)] * 2), lr]),
            size=jnp.concatenate([jnp.stack([
                jnp.asarray([self.obj_half, self.obj_half, 0.01]),
                PEG_HALF,
            ]), ls]),
            color=jnp.asarray([list(self.obj_color),
                               [0.4, 0.4, 0.45],
                               [0.65, 0.65, 0.7], [0.6, 0.6, 0.68],
                               [0.55, 0.55, 0.65]]),
            kind=jnp.zeros((5,), jnp.int32),
            plane_z=jnp.asarray(TABLE_Z, jnp.float32))
        return R.render_scene(scene, self.camera, self.image_size,
                              self.image_size, backend=self.renderer)
