"""Can (pick-place) and Square (nut assembly) on the rigid-body contact core.

Contact-fidelity upgrade of envs/pick_place.py (VERDICT r2 missing #2): the
object is a free rigid body on the penalty-contact engine
(envs/physics/engine.py) and the gripper two kinematic sphere finger pads —
grasping, transport, bin drop-in, and nut-over-peg insertion all emerge from
contact forces + Coulomb friction, and the grasp stage of the reward keys
off *physical contact events* (engine.pair_in_contact), matching robosuite's
`_check_grasp` geom-contact semantics (the reference wraps robosuite
PickPlaceCan / NutAssemblySquare, envs/robosuite_env.py:180-190
`_check_success`), not distance latches.

Scene statics are body_id=-1 engine geoms, so the can physically drops
between the bin walls and the square nut (a 4-bar open-center frame) slides
down *over* the peg — insertion succeeds only when the peg passes through
the nut's hole, exactly the contact event robosuite checks.

The Panda arm, OSC-style action surface, obs layout (robot0_* + 14-dim
robosuite object-state), seeded spawns, and episode protocol are identical
to envs/pick_place.py; these classes are drop-in `_target_` swaps in the
data configs.
"""

from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp

from ..ops import render as R
from ..ops import rotations as rot
from . import physics as ph
from . import robosuite_arm as ra
from .aloha_base import _link_frame
from .lift import EEF_SPEED, GRIPPER_SPEED, TABLE_Z, WORK_HI, WORK_LO
from .pick_place import (BIN_CENTER, BIN_HALF, BIN_WALL_H, NUT_TOL,
                         PEG_HALF_XY, PEG_HALF_Z, PEG_POS)
from .physics import kinematics as K

PANDA_CHAIN = ra.panda_chain(base_pos=(-0.56, 0.0, TABLE_Z))

OBJ, PAD_L, PAD_R = 0, 1, 2
OBJ_MASS = 0.05
PAD_RADIUS = 0.008


class PickPlacePhysState(flax.struct.PyTreeNode):
    bodies: ph.RigidBody       # [object, left pad, right pad]
    qpos: jnp.ndarray          # (7,) Panda joints
    eef_target: jnp.ndarray    # integrated OSC Cartesian target
    gripper: jnp.ndarray       # () in [0 closed, 1 open]
    t: jnp.ndarray

    @property
    def obj_pos(self) -> jnp.ndarray:
        return self.bodies.pos[OBJ]

    @property
    def eef_pos(self) -> jnp.ndarray:
        return K.eef_pose(PANDA_CHAIN, self.qpos)[0]


class _PickPlacePhysBase:
    """Shared contact-physics pick-and-place machinery (lift_physics.py
    pattern: kinematic pad spheres squeeze a free body)."""

    obs_keys = ("robot0_eef_pos", "robot0_eef_quat", "robot0_gripper_qpos",
                "object", "agentview_image")
    action_dim = 7
    episode_len = 400
    max_reward = 1.0

    # subclasses set these
    spawn_lo: jnp.ndarray
    spawn_hi: jnp.ndarray
    obj_half: float            # grasp half-width along the pad axis
    obj_top: float             # object half-height (grasp z offset)
    obj_color: tuple

    def __init__(self, image_size: int = 64, render_images: bool = True,
                 episode_len: int = 400, n_substeps: int = 10,
                 dt: float = 0.002, renderer: str = "xla"):
        self.image_size = image_size
        self.render_images = render_images
        self.episode_len = episode_len
        self.renderer = renderer
        self.n_substeps = n_substeps
        self.world = self._make_world()
        self.params = ph.PhysicsParams(dt=dt, mu=1.5, kt=2000.0)
        self.camera = R.look_at(pos=(0.55, 0.0, 1.25),
                                lookat=(0.0, 0.0, TABLE_Z + 0.05))
        # slight squeeze past kissing contact generates the grip normal
        # force (the margin that holds the Lift cube at 100% expert success)
        self._min_halfgap = self.obj_half + PAD_RADIUS - 0.0018
        self._max_halfgap = self.obj_half + PAD_RADIUS + 0.02

    # subclass hooks ----------------------------------------------------
    def _obj_geoms(self) -> list[dict]:
        raise NotImplementedError

    def _static_geoms(self) -> list[dict]:
        raise NotImplementedError

    def _obj_inertia(self) -> list[float]:
        raise NotImplementedError

    def goal_pos(self) -> jnp.ndarray:
        raise NotImplementedError

    def check_success(self, state: PickPlacePhysState) -> jnp.ndarray:
        raise NotImplementedError

    # ------------------------------------------------------------------
    def _make_world(self) -> ph.World:
        geoms = ph.build_geoms(
            self._obj_geoms()
            + [ph.make_sphere_geom(PAD_RADIUS, body_id=PAD_L),
               ph.make_sphere_geom(PAD_RADIUS, body_id=PAD_R)]
            + self._static_geoms())
        return ph.World.create(
            mass=[OBJ_MASS, 1.0, 1.0],
            inertia=[self._obj_inertia(), [1e-3] * 3, [1e-3] * 3],
            geoms=geoms, plane_z=TABLE_Z,
            kinematic=[False, True, True])

    def _pad_positions(self, eef: jnp.ndarray, grip: jnp.ndarray):
        gap = self._min_halfgap + grip * (self._max_halfgap
                                          - self._min_halfgap)
        return (eef + jnp.asarray([-1.0, 0.0, 0.0]) * gap,
                eef + jnp.asarray([1.0, 0.0, 0.0]) * gap)

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
        eef_fk, _ = K.eef_pose(PANDA_CHAIN, qpos)
        grip = jnp.ones(())
        left, right = self._pad_positions(eef_fk, grip)
        obj_pos = jnp.concatenate([xy, jnp.asarray([TABLE_Z + self.obj_top])])
        obj_quat = jnp.concatenate([jnp.cos(yaw / 2)[None], jnp.zeros(2),
                                    jnp.sin(yaw / 2)[None]])
        bodies = ph.RigidBody.create(
            pos=jnp.stack([obj_pos, left, right]),
            quat=jnp.stack([obj_quat, rot.quat_identity(),
                            rot.quat_identity()]))
        state = PickPlacePhysState(bodies=bodies, qpos=qpos, eef_target=eef,
                                   gripper=grip, t=jnp.zeros((), jnp.int32))
        return state, self.obs(state)

    # ------------------------------------------------------------------
    def step(self, state: PickPlacePhysState, action: jnp.ndarray):
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
        bodies = bodies.replace(
            pos=bodies.pos.at[PAD_L].set(left).at[PAD_R].set(right),
            linvel=bodies.linvel
            .at[PAD_L].set((left - state.bodies.pos[PAD_L]) / control_dt)
            .at[PAD_R].set((right - state.bodies.pos[PAD_R]) / control_dt))
        bodies = ph.multi_step(self.world, bodies, self.params,
                               self.n_substeps)

        new_state = PickPlacePhysState(bodies=bodies, qpos=qpos,
                                       eef_target=eef_target, gripper=grip,
                                       t=state.t + 1)
        success = self.check_success(new_state)
        dist = jnp.linalg.norm(bodies.pos[OBJ] - eef)
        reach = 1.0 - jnp.tanh(10.0 * dist)
        grasped = self.holding(new_state)
        reward = jnp.where(success, 1.0,
                           0.25 * reach + jnp.where(grasped, 0.25, 0.0))
        return new_state, self.obs(new_state), reward, success

    def holding(self, state: PickPlacePhysState) -> jnp.ndarray:
        """Both finger pads in squeezing contact with the object — a pure
        contact event (robosuite `_check_grasp` parity)."""
        contacts = ph.generate_contacts(self.world, state.bodies)
        return (ph.pair_in_contact(contacts, OBJ, PAD_L)
                & ph.pair_in_contact(contacts, OBJ, PAD_R))

    # ------------------------------------------------------------------
    def obs(self, state: PickPlacePhysState) -> dict:
        gripper_q = jnp.asarray([0.020 + 0.024 * state.gripper,
                                 -0.020 - 0.024 * state.gripper])
        eef, eef_quat = K.eef_pose(PANDA_CHAIN, state.qpos)
        obj = state.bodies.pos[OBJ]
        obj_quat = state.bodies.quat[OBJ]
        # 14-dim robosuite object-state: pos, quat xyzw, to-eef pos,
        # to-eef quat xyzw (envs/robosuite_env.py get_observation "object")
        rel_quat = rot.quat_mul(obj_quat, rot.quat_conj(eef_quat))
        obs = {
            "robot0_eef_pos": eef,
            "robot0_eef_quat": rot.quat_wxyz_to_xyzw(eef_quat),
            "robot0_joint_pos": state.qpos,
            "robot0_gripper_qpos": gripper_q,
            "object": jnp.concatenate([
                obj, rot.quat_wxyz_to_xyzw(obj_quat),
                obj - eef, rot.quat_wxyz_to_xyzw(rel_quat)]),
        }
        if self.render_images:
            obs["agentview_image"] = self.render(state)
        return obs

    def get_state(self, state):
        return state

    def reset_to(self, state):
        """Deterministic state-injection reset (parity: the reference's
        reset_to replay, envs/robosuite_env.py:88-120)."""
        return state, self.obs(state)

    # ------------------------------------------------------------------
    def scripted_action(self, state: PickPlacePhysState,
                        rng: jax.Array | None = None,
                        noise: float = 0.0) -> jnp.ndarray:
        """Waypoint expert over the physical gripper: align → descend →
        squeeze → carry → lower → release (no kinematic attach)."""
        obj = state.bodies.pos[OBJ]
        obj_rot = rot.quat_to_matrix(state.bodies.quat[OBJ])
        eef, _ = K.eef_pose(PANDA_CHAIN, state.qpos)
        grasp_at = obj + obj_rot @ jnp.asarray(self.grasp_offset(),
                                               jnp.float32)
        # committed hold = gripper closed at the grasp point (the
        # lift_physics expert's distance commitment) — the raw contact
        # predicate chatters as the payload micro-bounces, and one open
        # frame unwinds the whole carry
        holding = (state.gripper < 0.25) & (
            jnp.linalg.norm(grasp_at - eef) < 0.025)

        above_obj = grasp_at + jnp.asarray([0.0, 0.0, 0.08])
        xy_near = jnp.linalg.norm(grasp_at[:2] - eef[:2]) < 0.006
        z_near = jnp.abs(grasp_at[2] - eef[2]) < 0.006

        # while held, the eef leads the object by the (rotated) grasp offset
        goal = self.goal_pos()
        eef_goal = goal + obj_rot @ jnp.asarray(self.grasp_offset(),
                                                jnp.float32)
        over_goal = jnp.linalg.norm(obj[:2] - goal[:2]) < self.align_tol()
        carry_z = TABLE_Z + 0.20
        above_goal = eef_goal.at[2].set(carry_z)
        lower_goal = eef_goal.at[2].set(self.release_z())
        low = jnp.abs(eef[2] - lower_goal[2]) < 0.012

        reach_target = jnp.where(xy_near, grasp_at, above_obj)
        carry_target = jnp.where(over_goal, lower_goal, above_goal)
        target = jnp.where(holding, carry_target, reach_target)
        delta = jnp.clip((target - eef) / EEF_SPEED, -1.0, 1.0)
        # stop while the fingers squeeze; transport slowly once holding —
        # friction can only accelerate the payload so fast
        delta = jnp.where(xy_near & z_near & ~holding, 0.0,
                          jnp.where(holding, jnp.clip(delta, -0.25, 0.25),
                                    delta))
        release = holding & over_goal & low
        close = jnp.where(release, -1.0,
                          jnp.where(holding | (xy_near & z_near), 1.0, -1.0))
        act = jnp.concatenate([delta, jnp.zeros(3), close[None]])
        if noise > 0.0 and rng is not None:
            act = act + noise * jax.random.normal(rng, act.shape)
        return jnp.clip(act, -1.0, 1.0)

    def grasp_offset(self) -> tuple:
        """Body-frame offset of the grasp point from the object center."""
        return (0.0, 0.0, 0.0)

    def align_tol(self) -> float:
        """xy alignment (m) required before lowering onto the goal."""
        return 0.012

    def release_z(self) -> float:
        """eef height at which the gripper opens over the goal."""
        return TABLE_Z + 0.10

    # ------------------------------------------------------------------
    def _render_common(self, state: PickPlacePhysState, statics):
        """statics: list of (pos, half_size, color) static boxes."""
        ps, _ = K.fk(PANDA_CHAIN, state.qpos)
        segs = [(ps[1], ps[3], 0.045), (ps[3], ps[5], 0.035),
                (ps[5], ps[7], 0.03)]
        link_pos, link_rot, link_size = [], [], []
        for p0, p1, w in segs:
            c, m, h = _link_frame(p0, p1, w)
            link_pos.append(c), link_rot.append(m), link_size.append(h)
        obj_rot = rot.quat_to_matrix(state.bodies.quat[OBJ])
        obj_prims = self._obj_render_prims(state, obj_rot)
        n_obj = len(obj_prims[0])
        pos = jnp.concatenate([
            jnp.stack(obj_prims[0]),
            state.bodies.pos[PAD_L][None], state.bodies.pos[PAD_R][None],
            jnp.stack([jnp.asarray(p, jnp.float32) for p, _, _ in statics])
            if statics else jnp.zeros((0, 3)),
            jnp.stack(link_pos)])
        rots = jnp.concatenate([
            jnp.stack(obj_prims[1]),
            jnp.tile(jnp.eye(3)[None], (2 + len(statics), 1, 1)),
            jnp.stack(link_rot)])
        size = jnp.concatenate([
            jnp.stack(obj_prims[2]),
            jnp.full((2, 3), PAD_RADIUS),
            jnp.stack([jnp.asarray(s, jnp.float32) for _, s, _ in statics])
            if statics else jnp.zeros((0, 3)),
            jnp.stack(link_size)])
        color = jnp.concatenate([
            jnp.tile(jnp.asarray(self.obj_color, jnp.float32)[None],
                     (n_obj, 1)),
            jnp.tile(jnp.asarray([[0.2, 0.2, 0.25]]), (2, 1)),
            jnp.stack([jnp.asarray(c, jnp.float32) for _, _, c in statics])
            if statics else jnp.zeros((0, 3)),
            jnp.asarray([[0.65, 0.65, 0.7], [0.6, 0.6, 0.68],
                         [0.55, 0.55, 0.65]])])
        kind = jnp.concatenate([
            jnp.zeros((n_obj,), jnp.int32),
            jnp.ones((2,), jnp.int32),
            jnp.zeros((len(statics) + 3,), jnp.int32)])
        scene = R.Scene(pos=pos, rot=rots, size=size, color=color, kind=kind,
                        plane_z=jnp.asarray(TABLE_Z, jnp.float32))
        return R.render_scene(scene, self.camera, self.image_size,
                              self.image_size, backend=self.renderer)

    def _obj_render_prims(self, state, obj_rot):
        raise NotImplementedError


# ---------------------------------------------------------------------------
# Can: pick the can, drop it between the physical bin walls
# ---------------------------------------------------------------------------

# squat proportions (z-half = xy-half): tall boxes are unstable on the
# penalty plane (the impulse caps budget linear momentum only, so the
# corner-rocking mode pumps energy until launch — measured: a 0.035-half
# can explodes from rest in 3 control steps); the Lift cube's aspect is the
# engine's validated stable regime
CAN_HALF = jnp.asarray([0.025, 0.025, 0.025])
_BIN_WALLS = [
    ((float(BIN_CENTER[0]), float(BIN_CENTER[1]) - BIN_HALF,
      TABLE_Z + BIN_WALL_H / 2), (BIN_HALF, 0.005, BIN_WALL_H / 2)),
    ((float(BIN_CENTER[0]), float(BIN_CENTER[1]) + BIN_HALF,
      TABLE_Z + BIN_WALL_H / 2), (BIN_HALF, 0.005, BIN_WALL_H / 2)),
    ((float(BIN_CENTER[0]) - BIN_HALF, float(BIN_CENTER[1]),
      TABLE_Z + BIN_WALL_H / 2), (0.005, BIN_HALF, BIN_WALL_H / 2)),
    ((float(BIN_CENTER[0]) + BIN_HALF, float(BIN_CENTER[1]),
      TABLE_Z + BIN_WALL_H / 2), (0.005, BIN_HALF, BIN_WALL_H / 2)),
]


class CanPhysicsEnv(_PickPlacePhysBase):
    """robosuite-PickPlaceCan-parity env over the contact engine."""

    spawn_lo = jnp.asarray([-0.12, -0.18])
    spawn_hi = jnp.asarray([0.02, -0.02])
    obj_half = float(CAN_HALF[0])
    obj_top = float(CAN_HALF[2])
    obj_color = (0.8, 0.25, 0.2)

    def _obj_geoms(self):
        return [ph.make_box_geom(list(CAN_HALF), body_id=OBJ)]

    def _static_geoms(self):
        return [ph.make_box_geom(list(half), body_id=-1, offset=list(pos))
                for pos, half in _BIN_WALLS]

    def _obj_inertia(self):
        s = 2 * float(CAN_HALF[0])
        return [OBJ_MASS * s * s / 6.0] * 3

    def goal_pos(self) -> jnp.ndarray:
        return BIN_CENTER + jnp.asarray([0.0, 0.0, self.obj_top + 0.06])

    def release_z(self) -> float:
        # can falls ~6 cm between the physical bin walls
        return TABLE_Z + 0.10

    def check_success(self, state: PickPlacePhysState) -> jnp.ndarray:
        o = state.bodies.pos[OBJ]
        in_bin_xy = jnp.all(jnp.abs(o[:2] - BIN_CENTER[:2]) < BIN_HALF)
        settled = o[2] < TABLE_Z + self.obj_top + 0.02
        return in_bin_xy & settled & ~self.holding(state)

    def _obj_render_prims(self, state, obj_rot):
        return ([state.bodies.pos[OBJ]], [obj_rot], [CAN_HALF])

    def render(self, state: PickPlacePhysState) -> jnp.ndarray:
        statics = [(p, s, (0.55, 0.45, 0.25)) for p, s in _BIN_WALLS]
        return self._render_common(state, statics)


# ---------------------------------------------------------------------------
# Square: 4-bar nut frame slides down over the static peg
# ---------------------------------------------------------------------------

HOLE_HALF = 0.017            # half-width of the nut's square hole
BAR_W = 0.008                # bar half-thickness
BAR_H = 0.008                # bar half-height
BAR_LEN = HOLE_HALF + 2 * BAR_W
# nut frame: two bars along x at y=±(hole+w), two along y at x=±(hole+w)
_NUT_BARS = [
    ((0.0, -(HOLE_HALF + BAR_W), 0.0), (BAR_LEN, BAR_W, BAR_H)),
    ((0.0, (HOLE_HALF + BAR_W), 0.0), (BAR_LEN, BAR_W, BAR_H)),
    ((-(HOLE_HALF + BAR_W), 0.0, 0.0), (BAR_W, BAR_LEN, BAR_H)),
    (((HOLE_HALF + BAR_W), 0.0, 0.0), (BAR_W, BAR_LEN, BAR_H)),
]
PEG_TOP = TABLE_Z + 2 * PEG_HALF_Z


class SquarePhysicsEnv(_PickPlacePhysBase):
    """robosuite-NutAssemblySquare-parity env over the contact engine.

    The nut is a rigid 4-bar frame with an open center; success requires the
    peg physically inside the hole below the peg top — the insertion only
    happens if the frame drops over the peg through real contacts."""

    spawn_lo = jnp.asarray([-0.13, -0.15])
    spawn_hi = jnp.asarray([-0.01, 0.0])
    # pads squeeze the whole frame across the outer ±x bar faces — a
    # centered grasp (zero gravity torque; an off-center bar grasp pivots
    # under the point contacts and the frame dangles vertical)
    obj_half = float(HOLE_HALF + 2 * BAR_W)
    obj_top = float(BAR_H)
    obj_color = (0.75, 0.65, 0.15)

    def _obj_geoms(self):
        return [ph.make_box_geom(list(half), body_id=OBJ, offset=list(off))
                for off, half in _NUT_BARS]

    def _static_geoms(self):
        return [ph.make_box_geom([PEG_HALF_XY, PEG_HALF_XY, PEG_HALF_Z],
                                 body_id=-1,
                                 offset=[float(PEG_POS[0]),
                                         float(PEG_POS[1]),
                                         TABLE_Z + PEG_HALF_Z])]

    def _obj_inertia(self):
        s = 2 * BAR_LEN
        return [OBJ_MASS * s * s / 6.0] * 3

    def align_tol(self) -> float:
        # hole half 17 mm vs peg half 12 mm: <4 mm offset clears the peg top
        return 0.004

    def release_z(self) -> float:
        # nut seated on the table with the peg through the hole
        return TABLE_Z + BAR_H + 0.004

    def goal_pos(self) -> jnp.ndarray:
        return PEG_POS.at[2].set(TABLE_Z + BAR_H)

    def check_success(self, state: PickPlacePhysState) -> jnp.ndarray:
        o = state.bodies.pos[OBJ]
        aligned = jnp.all(jnp.abs(o[:2] - PEG_POS[:2]) < NUT_TOL)
        below_top = o[2] < PEG_TOP - 0.01
        return aligned & below_top & ~self.holding(state)

    def _obj_render_prims(self, state, obj_rot):
        pos, rots, sizes = [], [], []
        base = state.bodies.pos[OBJ]
        for off, half in _NUT_BARS:
            pos.append(base + obj_rot @ jnp.asarray(off, jnp.float32))
            rots.append(obj_rot)
            sizes.append(jnp.asarray(half, jnp.float32))
        return (pos, rots, sizes)

    def render(self, state: PickPlacePhysState) -> jnp.ndarray:
        statics = [((float(PEG_POS[0]), float(PEG_POS[1]),
                     TABLE_Z + PEG_HALF_Z),
                    (PEG_HALF_XY, PEG_HALF_XY, PEG_HALF_Z),
                    (0.4, 0.4, 0.45))]
        return self._render_common(state, statics)
