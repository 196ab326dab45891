"""Device-resident Lift task: grasp a cube and raise it above the table.

The batched on-device counterpart of the reference's robosuite Lift setup
(envs/robosuite_env.py wrapping ``robosuite.make('Lift')``): same episode
protocol (seeded resets with randomized cube placement, OSC-style delta end-
effector actions with a gripper channel, ``horizon=400`` cap), same success
criterion (cube lifted > 4 cm above the table — robosuite's
``_check_success``), same observation keys (robot0_eef_pos / robot0_eef_quat /
robot0_gripper_qpos / object-state / agentview_image 64×64).

The dynamics are an intentionally simplified rigid-body model (point-mass
end-effector servo, cube with gravity + table contact + kinematic grasp
attach) — a stand-in with correct semantics while the MJX-style contact
physics core lands (SURVEY.md §7 step 5). Everything is pure jnp: step() is
~50 fused element-wise ops, so 1k+ envs run inside one jitted rollout.

Geometry/units follow robosuite Lift: table top at z≈0.8, cube half-size
~2 cm, workspace around (0, 0, 1.0).
"""

from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp

from ..ops import render as R
from ..ops import rotations as rot

TABLE_Z = 0.8            # table top height
CUBE_HALF = 0.02
EEF_SPEED = 0.05         # max eef translation per control step (m)
GRIPPER_SPEED = 0.30     # gripper open/close fraction per step
GRASP_RADIUS = 0.028     # eef-cube distance for a grasp to engage
LIFT_SUCCESS = 0.04      # robosuite Lift: cube 4cm above table
GRAVITY_DZ = 0.025       # cube fall per step when free (quasi-static)
WORK_LO = jnp.asarray([-0.25, -0.25, TABLE_Z + 0.005])
WORK_HI = jnp.asarray([0.25, 0.25, TABLE_Z + 0.40])


class LiftState(flax.struct.PyTreeNode):
    eef_pos: jnp.ndarray       # (3,)
    gripper: jnp.ndarray       # () in [0 closed, 1 open]
    cube_pos: jnp.ndarray      # (3,)
    cube_yaw: jnp.ndarray      # ()
    grasped: jnp.ndarray       # () bool
    t: jnp.ndarray             # () int32 step counter


class LiftEnv:
    """Pure-function Lift env; batch by vmapping reset/step."""

    obs_keys = ("robot0_eef_pos", "robot0_eef_quat", "robot0_gripper_qpos",
                "object", "agentview_image")
    action_dim = 7           # dx dy dz (drx dry drz ignored) gripper
    episode_len = 400
    max_reward = 1.0

    def __init__(self, image_size: int = 64, render_images: bool = True,
                 episode_len: int = 400, renderer: str = "xla"):
        self.image_size = image_size
        self.render_images = render_images
        self.episode_len = episode_len
        self.renderer = renderer
        self.camera = R.look_at(pos=(0.55, 0.0, 1.25),
                                lookat=(0.0, 0.0, TABLE_Z + 0.05))

    # ------------------------------------------------------------------
    def reset(self, rng: jax.Array):
        xy_rng, yaw_rng = jax.random.split(rng)
        cube_xy = jax.random.uniform(xy_rng, (2,), minval=-0.1, maxval=0.1)
        yaw = jax.random.uniform(yaw_rng, (), minval=-jnp.pi / 6,
                                 maxval=jnp.pi / 6)
        state = LiftState(
            eef_pos=jnp.asarray([0.0, 0.0, TABLE_Z + 0.25]),
            gripper=jnp.ones(()),
            cube_pos=jnp.concatenate([cube_xy,
                                      jnp.asarray([TABLE_Z + CUBE_HALF])]),
            cube_yaw=yaw,
            grasped=jnp.zeros((), bool),
            t=jnp.zeros((), jnp.int32))
        return state, self.obs(state)

    # ------------------------------------------------------------------
    def step(self, state: LiftState, action: jnp.ndarray):
        action = jnp.clip(action, -1.0, 1.0)
        delta = action[:3] * EEF_SPEED
        eef = jnp.clip(state.eef_pos + delta, WORK_LO, WORK_HI)

        # gripper: action[6] > 0 means close (robosuite convention)
        target = jnp.where(action[6] > 0, 0.0, 1.0)
        grip = state.gripper + jnp.clip(target - state.gripper,
                                        -GRIPPER_SPEED, GRIPPER_SPEED)

        near = jnp.linalg.norm(state.cube_pos - eef) < GRASP_RADIUS
        closing = grip < 0.4
        grasped = jnp.where(state.grasped,
                            closing,            # release when opened
                            near & closing)     # engage when near + closing

        # cube: attached → follows eef; free → quasi-static gravity to table
        free_z = jnp.maximum(state.cube_pos[2] - GRAVITY_DZ,
                             TABLE_Z + CUBE_HALF)
        free_pos = state.cube_pos.at[2].set(free_z)
        cube = jnp.where(grasped, eef, free_pos)

        new_state = LiftState(eef_pos=eef, gripper=grip, cube_pos=cube,
                              cube_yaw=state.cube_yaw, grasped=grasped,
                              t=state.t + 1)
        success = cube[2] > TABLE_Z + LIFT_SUCCESS
        # staged shaping reward (reaching/grasping/lifting), success → 1.0
        dist = jnp.linalg.norm(cube - eef)
        reach = 1.0 - jnp.tanh(10.0 * dist)
        reward = jnp.where(success, 1.0,
                           0.25 * reach + jnp.where(grasped, 0.25, 0.0))
        return new_state, self.obs(new_state), reward, success

    # ------------------------------------------------------------------
    def obs(self, state: LiftState) -> dict:
        gripper_q = jnp.asarray([0.020 + 0.024 * state.gripper,
                                 -0.020 - 0.024 * state.gripper])
        # object-state layout parity with robosuite Lift (10-dim:
        # cube_pos, cube_quat xyzw, gripper_to_cube_pos — the exact
        # observable robomimic's lift HDF5s record, envs/robosuite_env.py
        # get_observation "object" ← di["object-state"]); all quats are
        # robosuite xyzw
        half_yaw = state.cube_yaw / 2.0
        cube_quat = jnp.asarray([jnp.cos(half_yaw), 0.0, 0.0,
                                 jnp.sin(half_yaw)])
        obs = {
            "robot0_eef_pos": state.eef_pos,
            "robot0_eef_quat": jnp.asarray([0.0, 0.0, 0.0, 1.0]),
            "robot0_gripper_qpos": gripper_q,
            "object": jnp.concatenate([
                state.cube_pos,
                rot.quat_wxyz_to_xyzw(cube_quat),
                state.cube_pos - state.eef_pos]),
        }
        if self.render_images:
            obs["agentview_image"] = self.render(state)
        return obs

    def render(self, state: LiftState) -> jnp.ndarray:
        grip_half = 0.008 + 0.006 * state.gripper
        scene = R.Scene(
            pos=jnp.stack([state.cube_pos,
                           state.eef_pos + jnp.asarray([0.0, 0.0, 0.04]),
                           state.eef_pos]),
            rot=jnp.stack([R.euler_z(state.cube_yaw),
                           jnp.eye(3), jnp.eye(3)]),
            size=jnp.stack([jnp.full((3,), CUBE_HALF),
                            jnp.asarray([0.015, 0.015, 0.035]),
                            jnp.asarray([grip_half, 0.02, 0.012])]),
            color=jnp.asarray([[0.85, 0.1, 0.1],       # red cube
                               [0.65, 0.65, 0.7],      # wrist
                               [0.2, 0.2, 0.25]]),     # fingers
            kind=jnp.zeros((3,), jnp.int32),
            plane_z=jnp.asarray(TABLE_Z, jnp.float32))
        return R.render_scene(scene, self.camera, self.image_size,
                              self.image_size, backend=self.renderer)

    # ------------------------------------------------------------------
    def get_state(self, state: LiftState):
        return state

    def reset_to(self, state):
        """Deterministic state-injection reset (parity: the reference's
        reset_to replay, envs/robosuite_env.py:88-120) — envs are pure
        functions of their state pytree, so injecting a recorded state IS
        the reset; the paired obs comes from the same pure obs map."""
        return state, self.obs(state)


    def scripted_action(self, state: LiftState, rng: jax.Array | None = None,
                        noise: float = 0.0) -> jnp.ndarray:
        """Waypoint expert: reach above cube → descend → grasp → lift.

        On-device parity with the reference's scripted collection idea
        (collect_aloha_scripted_demos.py policies) for self-contained demo
        generation.
        """
        above = state.cube_pos + jnp.asarray([0.0, 0.0, 0.08])
        at = state.cube_pos
        lift_to = state.cube_pos.at[2].set(TABLE_Z + 0.18)

        xy_near = jnp.linalg.norm(state.cube_pos[:2] - state.eef_pos[:2]) < 0.01
        z_near = jnp.abs(state.cube_pos[2] - state.eef_pos[2]) < 0.012

        target = jnp.where(state.grasped, lift_to,
                           jnp.where(xy_near, at, above))
        delta = jnp.clip((target - state.eef_pos) / EEF_SPEED, -1.0, 1.0)
        close = jnp.where(state.grasped | (xy_near & z_near), 1.0, -1.0)
        act = jnp.concatenate([delta, jnp.zeros(3), close[None]])
        if noise > 0.0 and rng is not None:
            act = act + noise * jax.random.normal(rng, act.shape)
        return jnp.clip(act, -1.0, 1.0)


LIFT_SHAPE_META = {
    "ac_dim": 7,
    "all_shapes": {
        "robot0_eef_pos": [3],
        "robot0_eef_quat": [4],
        "robot0_gripper_qpos": [2],
        "object": [10],  # robosuite Lift object-state: pos quat_xyzw grip_to_cube
        "agentview_image": [64, 64, 3],
        "optimal": [1],
    },
    "use_images": True,
}

LIFT_OBS_STATS = {
    "obs": {
        "robot0_eef_pos": {"min": [-0.25, -0.25, 0.8], "max": [0.25, 0.25, 1.2]},
        "robot0_eef_quat": {"min": [-1.0, -1.0, -1.0, -1.0],
                            "max": [1.0, 1.0, 1.0, 1.0]},
        "robot0_gripper_qpos": {"min": [0.0, -0.05], "max": [0.05, 0.0]},
        "object": {"min": [-0.25, -0.25, 0.75, -1, -1, -1, -1,
                           -0.5, -0.5, -0.5],
                   "max": [0.25, 0.25, 1.25, 1, 1, 1, 1, 0.5, 0.5, 0.5]},
        "agentview_image": {"min": 0, "max": 255},
        "latent_agentview_image": {"min": -8.0, "max": 8.0},
        "optimal": {"min": 0, "max": 1},
    },
    "actions": {"clip_min": -1, "clip_max": 1},
}
