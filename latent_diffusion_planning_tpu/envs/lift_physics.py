"""Lift task on the rigid-body physics core: Panda arm + force grasping.

Same task protocol/obs surface as envs/lift.py (robosuite Lift parity:
seeded cube spawn, OSC-style delta-eef + gripper action, 4 cm lift success,
robot0_* + object + agentview_image obs) with two fidelity upgrades over the
kinematic stand-in:

- the cube is a free rigid body and the gripper two kinematic sphere finger
  pads — grasping emerges from penalty contacts + Coulomb friction
  (envs/physics/engine.py), not a kinematic attach,
- a 7-DoF Panda arm (envs/robosuite_arm.py) carries the gripper: OSC-style
  eef deltas resolve through IK + rate-limited joint servos over the
  URDF-exact chain, so robot0_eef_pos/quat come from forward kinematics and
  robot0_joint_pos is true joint state (parity: robosuite's OSC_POSE Panda,
  envs/robosuite_env.py:142-170).

This is the contact-fidelity step toward transferring reference-trained
policies (SURVEY.md §7 hard part 1). Control runs at 20 Hz with
``n_substeps`` physics substeps of ``dt`` per control step (MuJoCo-style
control/physics split).
"""

from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp

from ..ops import render as R
from ..ops import rotations as rot
from . import physics as ph
from . import robosuite_arm as ra
from .lift import (CUBE_HALF, EEF_SPEED, GRIPPER_SPEED, LIFT_SUCCESS, TABLE_Z,
                   WORK_HI, WORK_LO)
from .physics import kinematics as K

PANDA_CHAIN = ra.panda_chain(base_pos=(-0.56, 0.0, TABLE_Z))

CUBE_MASS = 0.05
PAD_RADIUS = 0.008
FINGER_MAX_HALFGAP = 0.045     # pad x-offset when fully open
FINGER_MIN_HALFGAP = CUBE_HALF + PAD_RADIUS - 0.0018  # slight squeeze closed


class LiftPhysState(flax.struct.PyTreeNode):
    bodies: ph.RigidBody       # [cube, left pad, right pad]
    qpos: jnp.ndarray          # (7,) Panda joint angles
    eef_target: jnp.ndarray    # integrated OSC Cartesian target
    gripper: jnp.ndarray       # () in [0 closed, 1 open]
    cube_yaw0: jnp.ndarray     # render-only initial yaw
    t: jnp.ndarray


def _make_world() -> ph.World:
    geoms = ph.build_geoms([
        ph.make_box_geom([CUBE_HALF] * 3, body_id=0),
        ph.make_sphere_geom(PAD_RADIUS, body_id=1),
        ph.make_sphere_geom(PAD_RADIUS, body_id=2),
    ])
    inertia_cube = [CUBE_MASS * (2 * CUBE_HALF) ** 2 / 6.0] * 3
    return ph.World.create(
        mass=[CUBE_MASS, 1.0, 1.0],
        inertia=[inertia_cube, [1e-3] * 3, [1e-3] * 3],
        geoms=geoms, plane_z=TABLE_Z, kinematic=[False, True, True])


class LiftPhysicsEnv:
    """robosuite-Lift-parity env over the contact engine."""

    obs_keys = ("robot0_eef_pos", "robot0_eef_quat", "robot0_gripper_qpos",
                "object", "agentview_image")
    action_dim = 7
    episode_len = 400
    max_reward = 1.0

    def __init__(self, image_size: int = 64, render_images: bool = True,
                 episode_len: int = 400, n_substeps: int = 10,
                 dt: float = 0.002, renderer: str = "xla"):
        self.image_size = image_size
        self.render_images = render_images
        self.episode_len = episode_len
        self.renderer = renderer
        self.n_substeps = n_substeps
        self.world = _make_world()
        self.params = ph.PhysicsParams(dt=dt, mu=1.5, kt=2000.0)
        self.camera = R.look_at(pos=(0.55, 0.0, 1.25),
                                lookat=(0.0, 0.0, TABLE_Z + 0.05))

    # ------------------------------------------------------------------
    def _pad_positions(self, eef: jnp.ndarray, grip: jnp.ndarray):
        gap = FINGER_MIN_HALFGAP + grip * (FINGER_MAX_HALFGAP
                                           - FINGER_MIN_HALFGAP)
        left = eef + jnp.asarray([-1.0, 0.0, 0.0]) * gap
        right = eef + jnp.asarray([1.0, 0.0, 0.0]) * gap
        return left, right

    def reset(self, rng: jax.Array):
        xy_rng, yaw_rng = jax.random.split(rng)
        cube_xy = jax.random.uniform(xy_rng, (2,), minval=-0.1, maxval=0.1)
        yaw = jax.random.uniform(yaw_rng, (), minval=-jnp.pi / 6,
                                 maxval=jnp.pi / 6)
        eef = jnp.asarray([0.0, 0.0, TABLE_Z + 0.25])
        qpos = ra.PANDA_HOME
        for _ in range(8):  # settle the home pose onto the start target
            qpos = ra.arm_track(PANDA_CHAIN, qpos, eef)
        eef_fk, _ = K.eef_pose(PANDA_CHAIN, qpos)
        grip = jnp.ones(())
        left, right = self._pad_positions(eef_fk, grip)
        cube_pos = jnp.concatenate([cube_xy, jnp.asarray([TABLE_Z + CUBE_HALF])])
        bodies = ph.RigidBody.create(
            pos=jnp.stack([cube_pos, left, right]),
            quat=jnp.stack([
                jnp.concatenate([jnp.cos(yaw / 2)[None], jnp.zeros(2),
                                 jnp.sin(yaw / 2)[None]]),
                jnp.asarray([1.0, 0, 0, 0]), jnp.asarray([1.0, 0, 0, 0])]))
        state = LiftPhysState(bodies=bodies, qpos=qpos, eef_target=eef,
                              gripper=grip, cube_yaw0=yaw,
                              t=jnp.zeros((), jnp.int32))
        return state, self.obs(state)

    # ------------------------------------------------------------------
    def step(self, state: LiftPhysState, action: jnp.ndarray):
        action = jnp.clip(action, -1.0, 1.0)
        eef_target = jnp.clip(state.eef_target + action[:3] * EEF_SPEED,
                              WORK_LO, WORK_HI)
        qpos = ra.arm_track(PANDA_CHAIN, state.qpos, eef_target)
        eef, _ = K.eef_pose(PANDA_CHAIN, qpos)
        target = jnp.where(action[6] > 0, 0.0, 1.0)
        grip = state.gripper + jnp.clip(target - state.gripper,
                                        -GRIPPER_SPEED, GRIPPER_SPEED)
        left, right = self._pad_positions(eef, grip)

        control_dt = self.params.dt * self.n_substeps
        bodies = state.bodies
        pad_vel = (left - bodies.pos[1]) / control_dt
        bodies = bodies.replace(
            pos=bodies.pos.at[1].set(left).at[2].set(right),
            linvel=bodies.linvel.at[1].set(pad_vel).at[2].set(
                (right - state.bodies.pos[2]) / control_dt))
        bodies = ph.multi_step(self.world, bodies, self.params,
                               self.n_substeps)

        new_state = LiftPhysState(bodies=bodies, qpos=qpos,
                                  eef_target=eef_target, gripper=grip,
                                  cube_yaw0=state.cube_yaw0, t=state.t + 1)
        cube = bodies.pos[0]
        success = cube[2] > TABLE_Z + CUBE_HALF + LIFT_SUCCESS
        dist = jnp.linalg.norm(cube - eef)
        reach = 1.0 - jnp.tanh(10.0 * dist)
        grasped = dist < 0.03
        reward = jnp.where(success, 1.0,
                           0.25 * reach + jnp.where(grasped, 0.25, 0.0))
        return new_state, self.obs(new_state), reward, success

    # ------------------------------------------------------------------
    def obs(self, state: LiftPhysState) -> dict:
        cube = state.bodies.pos[0]
        gripper_q = jnp.asarray([0.020 + 0.024 * state.gripper,
                                 -0.020 - 0.024 * state.gripper])
        eef, eef_quat = K.eef_pose(PANDA_CHAIN, state.qpos)
        # object-state layout parity with robosuite Lift (10-dim: cube_pos,
        # cube_quat xyzw, gripper_to_cube_pos — the exact observable
        # robomimic lift HDF5s record, envs/robosuite_env.py get_observation
        # "object" ← di["object-state"]); all quats are robosuite xyzw
        obs = {
            "robot0_eef_pos": eef,
            "robot0_eef_quat": rot.quat_wxyz_to_xyzw(eef_quat),
            "robot0_joint_pos": state.qpos,
            "robot0_gripper_qpos": gripper_q,
            "object": jnp.concatenate([
                cube, rot.quat_wxyz_to_xyzw(state.bodies.quat[0]),
                cube - eef]),
        }
        if self.render_images:
            obs["agentview_image"] = self.render(state)
        return obs

    def render(self, state: LiftPhysState) -> jnp.ndarray:
        from ..ops.rotations import quat_to_matrix
        from .aloha_base import _link_frame

        bodies = state.bodies
        ps, _ = K.fk(PANDA_CHAIN, state.qpos)
        # arm links: shoulder->elbow->wrist->eef as grey boxes
        segs = [(ps[1], ps[3], 0.045), (ps[3], ps[5], 0.035),
                (ps[5], ps[7], 0.03)]
        link_pos, link_rot, link_size = [], [], []
        for p0, p1, w in segs:
            c, m, h = _link_frame(p0, p1, w)
            link_pos.append(c), link_rot.append(m), link_size.append(h)
        scene = R.Scene(
            pos=jnp.stack([bodies.pos[0], bodies.pos[1], bodies.pos[2],
                           *link_pos]),
            rot=jnp.stack([quat_to_matrix(bodies.quat[0]),
                           jnp.eye(3), jnp.eye(3), *link_rot]),
            size=jnp.stack([jnp.full((3,), CUBE_HALF),
                            jnp.full((3,), PAD_RADIUS),
                            jnp.full((3,), PAD_RADIUS), *link_size]),
            color=jnp.asarray([[0.85, 0.1, 0.1],
                               [0.2, 0.2, 0.25],
                               [0.2, 0.2, 0.25],
                               [0.65, 0.65, 0.7],
                               [0.6, 0.6, 0.68],
                               [0.55, 0.55, 0.65]]),
            kind=jnp.asarray([0, 1, 1, 0, 0, 0], jnp.int32),
            plane_z=jnp.asarray(TABLE_Z, jnp.float32))
        return R.render_scene(scene, self.camera, self.image_size,
                              self.image_size, backend=self.renderer)

    def get_state(self, state: LiftPhysState):
        return state

    def reset_to(self, state):
        """Deterministic state-injection reset (parity: the reference's
        reset_to replay, envs/robosuite_env.py:88-120) — envs are pure
        functions of their state pytree, so injecting a recorded state IS
        the reset; the paired obs comes from the same pure obs map."""
        return state, self.obs(state)


    # ------------------------------------------------------------------
    def scripted_action(self, state: LiftPhysState,
                        rng: jax.Array | None = None,
                        noise: float = 0.0) -> jnp.ndarray:
        """Waypoint expert over the physical gripper: align → descend →
        squeeze → lift (no kinematic attach to cheat with)."""
        cube = state.bodies.pos[0]
        eef, _ = K.eef_pose(PANDA_CHAIN, state.qpos)
        closed = state.gripper < 0.25
        near = jnp.linalg.norm(cube - eef) < 0.02
        holding = closed & near

        above = cube + jnp.asarray([0.0, 0.0, 0.10])
        lift_to = eef.at[2].set(TABLE_Z + 0.25)
        xy_near = jnp.linalg.norm(cube[:2] - eef[:2]) < 0.006
        z_near = jnp.abs(cube[2] - eef[2]) < 0.006

        target = jnp.where(holding, lift_to,
                           jnp.where(xy_near, cube, above))
        delta = jnp.clip((target - eef) / EEF_SPEED, -1.0, 1.0)
        # stop moving while the gripper closes on the cube; transport slowly
        # once holding — friction can only accelerate the payload so fast
        delta = jnp.where(xy_near & z_near & ~closed, 0.0,
                          jnp.where(holding, jnp.clip(delta, -0.2, 0.2),
                                    delta))
        close = jnp.where(holding | (xy_near & z_near), 1.0, -1.0)
        act = jnp.concatenate([delta, jnp.zeros(3), close[None]])
        if noise > 0.0 and rng is not None:
            act = act + noise * jax.random.normal(rng, act.shape)
        return jnp.clip(act, -1.0, 1.0)
