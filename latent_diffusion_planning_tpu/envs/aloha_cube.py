"""Device-resident bimanual ALOHA transfer-cube task — joint-space dynamics.

Batched on-device counterpart of the reference's dm_control bimanual ViperX
transfer-cube env (envs/alohasim_env.py):

- action (14): [left_arm_qpos_target (6, rad), left_gripper (1, normalized
  0..1), right_arm_qpos_target (6), right_gripper (1)] — absolute joint
  position control, the reference's convention (:19-35, before_step :56-70
  with PUPPET_GRIPPER_POSITION_UNNORMALIZE on the gripper channel),
- obs: ``qpos``/``qvel`` 14-dim joint-space vectors (get_qpos/get_qvel
  :76-97), ``env_state`` = cube pose (get_env_state :139-141),
  ``wrist64_image`` rendered from the camera on the right gripper frame
  (vx300s_right.xml:27),
- staged contact reward 0-4 (touch-right → lifted → touch-left → transferred,
  :143-167), success at max_reward=4,
- episode protocol: 400 steps at DT=0.02, cube spawn x∈[0,0.2] y∈[0.4,0.6]
  (alohasim_ee_env.sample_box_pose :16-25), arms at START_ARM_POSE.

Dynamics: per-joint position servos over the exact MJCF ViperX kinematic
chains (envs/aloha_base.py); the cube attaches kinematically to a closing
gripper whose grasp point is within reach (force-based contact grasping is
the physics-core upgrade path, envs/lift_physics.py).
"""

from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp

from ..ops import render as R
from ..ops import rotations as rot
from . import aloha_base as B
from . import aloha_constants as C

CUBE_HALF = 0.02
LIFT_EPS = 0.015
MEET = jnp.asarray([0.0, 0.5, 0.25])


class AlohaCubeState(flax.struct.PyTreeNode):
    left: B.ArmState
    right: B.ArmState
    cube_pos: jnp.ndarray
    held_left: jnp.ndarray    # () bool
    held_right: jnp.ndarray   # () bool
    t: jnp.ndarray


class AlohaTransferCubeEnv:
    """Pure-function bimanual transfer-cube env (joint-space control)."""

    obs_keys = ("qpos", "qvel", "env_state", "wrist64_image")
    action_dim = 14
    episode_len = 400
    max_reward = 4.0

    def __init__(self, image_size: int = 64, render_images: bool = True,
                 episode_len: int = 400, renderer: str = "xla",
                 camera_names: tuple = ("wrist64",)):
        """``camera_names`` selects the observed cameras (reference surface:
        wrist64 + top/angle/front_close/left_pillar, alohasim_env.py:102-114
        — static ones render at their reference resolutions)."""
        self.image_size = image_size
        self.render_images = render_images
        self.episode_len = episode_len
        self.renderer = renderer
        self.camera_names = tuple(camera_names)

    # ------------------------------------------------------------------
    def reset(self, rng: jax.Array):
        x_rng, y_rng = jax.random.split(rng)
        cube = jnp.asarray([
            jax.random.uniform(x_rng, (), minval=0.0, maxval=0.2),
            jax.random.uniform(y_rng, (), minval=0.4, maxval=0.6),
            B.TABLE_Z + CUBE_HALF])
        state = AlohaCubeState(
            left=B.arm_reset(), right=B.arm_reset(),
            cube_pos=cube,
            held_left=jnp.zeros((), bool),
            held_right=jnp.zeros((), bool),
            t=jnp.zeros((), jnp.int32))
        return state, self.obs(state)

    # ------------------------------------------------------------------
    def step(self, state: AlohaCubeState, action: jnp.ndarray):
        left = B.arm_step(state.left, action[0:6], action[6])
        right = B.arm_step(state.right, action[7:13], action[13])

        held_left = B.holding(B.LEFT_CHAIN, left, state.cube_pos,
                              state.held_left)
        held_right = B.holding(B.RIGHT_CHAIN, right, state.cube_pos,
                               state.held_right)
        # left takes priority on simultaneous holds (transfer handoff)
        held_right = held_right & ~held_left

        l_tip, _ = B.eef(B.LEFT_CHAIN, left)
        r_tip, _ = B.eef(B.RIGHT_CHAIN, right)
        free_z = jnp.maximum(state.cube_pos[2] - 0.02, B.TABLE_Z + CUBE_HALF)
        cube = jnp.where(held_left, l_tip,
                         jnp.where(held_right, r_tip,
                                   state.cube_pos.at[2].set(free_z)))

        new_state = AlohaCubeState(
            left=left, right=right, cube_pos=cube,
            held_left=held_left, held_right=held_right, t=state.t + 1)
        reward = self.reward(new_state)
        success = reward >= self.max_reward
        return new_state, self.obs(new_state), reward, success

    def reward(self, state: AlohaCubeState) -> jnp.ndarray:
        """Staged ladder parity: alohasim_env.py:143-167."""
        touch_right = B.touching(B.RIGHT_CHAIN, state.right, state.cube_pos)
        touch_left = B.touching(B.LEFT_CHAIN, state.left, state.cube_pos)
        off_table = state.cube_pos[2] > B.TABLE_Z + CUBE_HALF + LIFT_EPS
        r = jnp.zeros(())
        r = jnp.where(touch_right, 1.0, r)
        r = jnp.where(touch_right & off_table, 2.0, r)
        r = jnp.where(touch_left, 3.0, r)
        r = jnp.where(touch_left & off_table, 4.0, r)
        return r

    # ------------------------------------------------------------------
    def obs(self, state: AlohaCubeState) -> dict:
        out = {
            "qpos": B.qpos_obs(state.left, state.right),
            "qvel": B.qvel_obs(state.left, state.right),
            "env_state": jnp.concatenate([state.cube_pos,
                                          rot.quat_identity()]),
        }
        if self.render_images:
            scene = self.scene(state)
            views = B.camera_views(self.camera_names, state.right,
                                   self.image_size)
            for name, (cam, (h, w)) in views.items():
                out[f"{name}_image"] = R.render_scene(
                    scene, cam, h, w, backend=self.renderer)
        return out

    def scene(self, state: AlohaCubeState) -> R.Scene:
        lp, lr, ls, lc = B.arm_scene_prims(B.LEFT_CHAIN, state.left,
                                           (0.25, 0.25, 0.35))
        rp, rr, rs, rc = B.arm_scene_prims(B.RIGHT_CHAIN, state.right,
                                           (0.2, 0.3, 0.2))
        return R.Scene(
            pos=jnp.concatenate([state.cube_pos[None], lp, rp]),
            rot=jnp.concatenate([jnp.eye(3)[None], lr, rr]),
            size=jnp.concatenate([jnp.full((1, 3), CUBE_HALF), ls, rs]),
            color=jnp.concatenate([jnp.asarray([[0.85, 0.1, 0.1]]), lc, rc]),
            kind=jnp.zeros((9,), jnp.int32),
            plane_z=jnp.asarray(B.TABLE_Z, jnp.float32))

    def render(self, state: AlohaCubeState) -> jnp.ndarray:
        cam = B.wrist64_camera(state.right)
        return R.render_scene(self.scene(state), cam, self.image_size,
                              self.image_size, backend=self.renderer)

    def get_state(self, state: AlohaCubeState):
        return state

    def reset_to(self, state):
        """Deterministic state-injection reset (parity: the reference's
        reset_to replay, envs/robosuite_env.py:88-120) — envs are pure
        functions of their state pytree, so injecting a recorded state IS
        the reset; the paired obs comes from the same pure obs map."""
        return state, self.obs(state)


    # ------------------------------------------------------------------
    def scripted_action(self, state: AlohaCubeState,
                        rng: jax.Array | None = None,
                        noise: float = 0.0) -> jnp.ndarray:
        """Two-arm transfer expert in EE space solved through IK (parity:
        PickAndTransferPolicy, collect_aloha_scripted_demos.py:70-107):
        right picks the cube, carries it to the meet point; left meets it,
        grasps, right releases and retreats."""
        cube = state.cube_pos
        right_has = state.held_right
        left_has = state.held_left
        l_tip, _ = B.eef(B.LEFT_CHAIN, state.left)
        r_tip, _ = B.eef(B.RIGHT_CHAIN, state.right)

        at_meet = jnp.linalg.norm(cube - MEET) < 0.02

        above = cube + jnp.asarray([0.0, 0.0, 0.07])
        r_xy_near = jnp.linalg.norm(cube[:2] - r_tip[:2]) < 0.015
        r_z_near = jnp.abs(cube[2] - r_tip[2]) < 0.015
        r_target = jnp.where(right_has, MEET,
                             jnp.where(r_xy_near, cube, above))
        r_target = jnp.where(left_has, jnp.asarray([0.3, 0.5, 0.3]), r_target)
        r_grip = jnp.where(left_has, 1.0,
                           jnp.where(right_has | (r_xy_near & r_z_near),
                                     0.0, 1.0))

        stage = jnp.asarray([-0.12, MEET[1], MEET[2]])
        l_near = jnp.linalg.norm(cube - l_tip) < 0.02
        l_target = jnp.where(left_has, MEET + jnp.asarray([0.0, 0.0, 0.05]),
                             jnp.where(at_meet, cube, stage))
        l_grip = jnp.where(left_has | (at_meet & l_near), 0.0, 1.0)

        ql = B.scripted_arm_action(B.LEFT_CHAIN, state.left, l_target)
        qr = B.scripted_arm_action(B.RIGHT_CHAIN, state.right, r_target)
        act = jnp.concatenate([ql, l_grip[None], qr, r_grip[None]])
        if noise > 0.0 and rng is not None:
            act = act + noise * jax.random.normal(rng, act.shape)
        return act


ALOHA_SHAPE_META = {
    "ac_dim": 14,
    "all_shapes": {
        "qpos": [14],
        "qvel": [14],
        "env_state": [7],
        "wrist64_image": [64, 64, 3],
        "optimal": [1],
    },
    "use_images": True,
}

# normalization bounds reflect task motion (padded data ranges — like the
# reference's measured per-task tables), not the full mechanical joint range:
# full-range normalization crushes the diffusion targets to ~10% contrast
_ARM_LO = [-0.8, -1.86, 0.1, -0.8, -0.9, -0.8]
_ARM_HI = [0.8, 0.7, 1.61, 0.8, 0.4, 0.8]

ALOHA_OBS_STATS = {
    "obs": {
        "qpos": {"min": _ARM_LO + [0.0] + _ARM_LO + [0.0],
                 "max": _ARM_HI + [1.0] + _ARM_HI + [1.0]},
        "qvel": {"min": [-10.0] * 14, "max": [10.0] * 14},
        "env_state": {"min": [-0.5, 0.0, -0.1, -1, -1, -1, -1],
                      "max": [0.5, 1.0, 0.6, 1, 1, 1, 1]},
        "wrist64_image": {"min": 0, "max": 255},
        "latent_wrist64_image": {"min": -8.0, "max": 8.0},
        "optimal": {"min": 0, "max": 1},
    },
    # actions are joint radians + normalized grip: per-dim bounds (parity
    # with the reference's per-dim action normalization tables,
    # data/cfg/aloha_cube/wrist.yaml:24-50)
    "actions": {"min": _ARM_LO + [0.0] + _ARM_LO + [0.0],
                "max": _ARM_HI + [1.0] + _ARM_HI + [1.0]},
}
