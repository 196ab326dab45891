"""Device-resident bimanual ALOHA transfer-cube task.

Batched on-device counterpart of the reference's dm_control bimanual ViperX
transfer-cube env (envs/alohasim_env.py): same episode protocol (400 steps at
DT=0.02, randomized cube spawn via seeded reset — reference BOX_POSE +
sample_box_pose, envs/alohasim_ee_env.py:16-25), same **staged contact
reward** (1: right gripper touches box, 2: right holds it off the table,
3: left gripper touches it, 4: left holds it off the table — success when the
reward reaches ``max_reward=4``, envs/alohasim_env.py:143-167), same obs
surface (``qpos`` 14-dim proprio + ``wrist64_image`` 64×64 camera,
data/cfg/aloha_cube/wrist.yaml).

The arm model is simplified to bimanual task-space point grippers (the 14-dim
action is [left: dxyz, 3 unused, grip | right: dxyz, 3 unused, grip]) while
the MJX-style joint-space physics core lands; the task logic, reward ladder,
obs keys, scripted two-arm transfer expert, and episode protocol match the
reference's semantics.
"""

from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp

from ..ops import render as R

TABLE_Z = 0.0
CUBE_HALF = 0.02
EEF_SPEED = 0.04
GRIPPER_SPEED = 0.35
GRASP_RADIUS = 0.03
TOUCH_RADIUS = 0.045
LIFT_EPS = 0.015          # cube off the table when above half-size + eps
MEET = jnp.asarray([0.0, 0.45, 0.32])
WORK_LO = jnp.asarray([-0.45, 0.1, TABLE_Z + 0.01])
WORK_HI = jnp.asarray([0.45, 0.85, 0.55])


class AlohaCubeState(flax.struct.PyTreeNode):
    left_pos: jnp.ndarray     # (3,)
    left_grip: jnp.ndarray    # () in [0 closed, 1 open]
    right_pos: jnp.ndarray
    right_grip: jnp.ndarray
    cube_pos: jnp.ndarray
    held_left: jnp.ndarray    # () bool
    held_right: jnp.ndarray   # () bool
    t: jnp.ndarray


class AlohaTransferCubeEnv:
    """Pure-function bimanual transfer-cube env."""

    obs_keys = ("qpos", "wrist64_image")
    action_dim = 14
    episode_len = 400
    max_reward = 4.0

    def __init__(self, image_size: int = 64, render_images: bool = True,
                 episode_len: int = 400, renderer: str = "xla"):
        self.image_size = image_size
        self.render_images = render_images
        self.episode_len = episode_len
        self.renderer = renderer
        self.camera = R.look_at(pos=(0.0, -0.35, 0.6),
                                lookat=(0.0, 0.5, 0.05))

    # ------------------------------------------------------------------
    def reset(self, rng: jax.Array):
        # cube spawn ranges parity: alohasim_ee_env.sample_box_pose
        # x ∈ [0.0, 0.2], y ∈ [0.4, 0.6], z = 0.05 (here table frame z=half)
        x_rng, y_rng = jax.random.split(rng)
        cube = jnp.asarray([
            jax.random.uniform(x_rng, (), minval=0.0, maxval=0.2),
            jax.random.uniform(y_rng, (), minval=0.4, maxval=0.6),
            TABLE_Z + CUBE_HALF])
        state = AlohaCubeState(
            left_pos=jnp.asarray([-0.25, 0.5, 0.25]),
            left_grip=jnp.ones(()),
            right_pos=jnp.asarray([0.25, 0.5, 0.25]),
            right_grip=jnp.ones(()),
            cube_pos=cube,
            held_left=jnp.zeros((), bool),
            held_right=jnp.zeros((), bool),
            t=jnp.zeros((), jnp.int32))
        return state, self.obs(state)

    # ------------------------------------------------------------------
    def step(self, state: AlohaCubeState, action: jnp.ndarray):
        action = jnp.clip(action, -1.0, 1.0)
        l_delta, l_grip_cmd = action[0:3], action[6]
        r_delta, r_grip_cmd = action[7:10], action[13]

        left = jnp.clip(state.left_pos + l_delta * EEF_SPEED, WORK_LO, WORK_HI)
        right = jnp.clip(state.right_pos + r_delta * EEF_SPEED, WORK_LO, WORK_HI)

        # gripper command > 0 → close (normalized-gripper convention inverted
        # into a symmetric [-1,1] policy channel)
        l_target = jnp.where(l_grip_cmd > 0, 0.0, 1.0)
        r_target = jnp.where(r_grip_cmd > 0, 0.0, 1.0)
        lg = state.left_grip + jnp.clip(l_target - state.left_grip,
                                        -GRIPPER_SPEED, GRIPPER_SPEED)
        rg = state.right_grip + jnp.clip(r_target - state.right_grip,
                                         -GRIPPER_SPEED, GRIPPER_SPEED)

        l_near = jnp.linalg.norm(state.cube_pos - left) < GRASP_RADIUS
        r_near = jnp.linalg.norm(state.cube_pos - right) < GRASP_RADIUS
        l_closing = lg < 0.4
        r_closing = rg < 0.4
        held_left = jnp.where(state.held_left, l_closing, l_near & l_closing)
        held_right = jnp.where(state.held_right, r_closing, r_near & r_closing)
        # left takes priority on simultaneous holds (transfer handoff)
        held_right = held_right & ~held_left

        free_z = jnp.maximum(state.cube_pos[2] - 0.02, TABLE_Z + CUBE_HALF)
        cube = jnp.where(held_left, left,
                         jnp.where(held_right, right,
                                   state.cube_pos.at[2].set(free_z)))

        new_state = AlohaCubeState(
            left_pos=left, left_grip=lg, right_pos=right, right_grip=rg,
            cube_pos=cube, held_left=held_left, held_right=held_right,
            t=state.t + 1)
        reward = self.reward(new_state)
        success = reward >= self.max_reward
        return new_state, self.obs(new_state), reward, success

    def reward(self, state: AlohaCubeState) -> jnp.ndarray:
        """Staged ladder parity: alohasim_env.py:143-167."""
        touch_right = (jnp.linalg.norm(state.cube_pos - state.right_pos)
                       < TOUCH_RADIUS)
        touch_left = (jnp.linalg.norm(state.cube_pos - state.left_pos)
                      < TOUCH_RADIUS)
        off_table = state.cube_pos[2] > TABLE_Z + CUBE_HALF + LIFT_EPS
        r = jnp.zeros(())
        r = jnp.where(touch_right, 1.0, r)
        r = jnp.where(touch_right & off_table, 2.0, r)
        r = jnp.where(touch_left, 3.0, r)
        r = jnp.where(touch_left & off_table, 4.0, r)
        return r

    # ------------------------------------------------------------------
    def obs(self, state: AlohaCubeState) -> dict:
        qpos = jnp.concatenate([
            state.left_pos, state.cube_pos - state.left_pos,
            state.left_grip[None],
            state.right_pos, state.cube_pos - state.right_pos,
            state.right_grip[None]])
        out = {"qpos": qpos}
        if self.render_images:
            out["wrist64_image"] = self.render(state)
        return out

    def render(self, state: AlohaCubeState) -> jnp.ndarray:
        def hand(pos, grip):
            half = 0.008 + 0.006 * grip
            return pos, jnp.asarray([half, 0.018, 0.012])

        l_size = hand(state.left_pos, state.left_grip)[1]
        r_size = hand(state.right_pos, state.right_grip)[1]
        scene = R.Scene(
            pos=jnp.stack([state.cube_pos,
                           state.left_pos + jnp.asarray([0, 0, 0.04]),
                           state.left_pos,
                           state.right_pos + jnp.asarray([0, 0, 0.04]),
                           state.right_pos]),
            rot=jnp.stack([jnp.eye(3)] * 5),
            size=jnp.stack([jnp.full((3,), CUBE_HALF),
                            jnp.asarray([0.012, 0.012, 0.03]), l_size,
                            jnp.asarray([0.012, 0.012, 0.03]), r_size]),
            color=jnp.asarray([[0.85, 0.1, 0.1],
                               [0.3, 0.3, 0.8], [0.15, 0.15, 0.4],
                               [0.3, 0.8, 0.3], [0.15, 0.4, 0.15]]),
            kind=jnp.zeros((5,), jnp.int32),
            plane_z=jnp.asarray(TABLE_Z, jnp.float32))
        return R.render_scene(scene, self.camera, self.image_size,
                              self.image_size, backend=self.renderer)

    def get_state(self, state: AlohaCubeState):
        return state

    # ------------------------------------------------------------------
    def scripted_action(self, state: AlohaCubeState,
                        rng: jax.Array | None = None,
                        noise: float = 0.0) -> jnp.ndarray:
        """Two-arm transfer expert (parity: PickAndTransferPolicy,
        collect_aloha_scripted_demos.py:70-107): right picks the cube and
        carries it to the meet point; left meets it, grasps, right releases."""
        cube = state.cube_pos
        right_has = state.held_right
        left_has = state.held_left

        at_meet = jnp.linalg.norm(cube - MEET) < 0.02

        # right arm plan
        above = cube + jnp.asarray([0.0, 0.0, 0.07])
        r_xy_near = jnp.linalg.norm(cube[:2] - state.right_pos[:2]) < 0.01
        r_z_near = jnp.abs(cube[2] - state.right_pos[2]) < 0.012
        r_target = jnp.where(right_has, MEET,
                             jnp.where(r_xy_near, cube, above))
        # once the left arm holds it, the right retreats
        r_target = jnp.where(left_has, jnp.asarray([0.3, 0.5, 0.3]), r_target)
        r_close = jnp.where(left_has, -1.0,
                            jnp.where(right_has | (r_xy_near & r_z_near),
                                      1.0, -1.0))

        # left arm: wait at staging until cube reaches meet point, then grasp
        stage = jnp.asarray([-0.12, MEET[1], MEET[2]])
        l_near = jnp.linalg.norm(cube - state.left_pos) < 0.012
        l_target = jnp.where(left_has, MEET + jnp.asarray([0.0, 0.0, 0.05]),
                             jnp.where(at_meet | right_has & at_meet, cube,
                                       stage))
        l_close = jnp.where(left_has | (at_meet & l_near), 1.0, -1.0)

        l_delta = jnp.clip((l_target - state.left_pos) / EEF_SPEED, -1, 1)
        r_delta = jnp.clip((r_target - state.right_pos) / EEF_SPEED, -1, 1)
        act = jnp.concatenate([l_delta, jnp.zeros(3), l_close[None],
                               r_delta, jnp.zeros(3), r_close[None]])
        if noise > 0.0 and rng is not None:
            act = act + noise * jax.random.normal(rng, act.shape)
        return jnp.clip(act, -1.0, 1.0)


ALOHA_SHAPE_META = {
    "ac_dim": 14,
    "all_shapes": {
        "qpos": [14],
        "wrist64_image": [64, 64, 3],
        "optimal": [1],
    },
    "use_images": True,
}

ALOHA_OBS_STATS = {
    "obs": {
        "qpos": {"min": [-0.5, 0.0, -0.1, -1.0, -1.0, -1.0, 0.0,
                         -0.5, 0.0, -0.1, -1.0, -1.0, -1.0, 0.0],
                 "max": [0.5, 1.0, 0.6, 1.0, 1.0, 1.0, 1.0,
                         0.5, 1.0, 0.6, 1.0, 1.0, 1.0, 1.0]},
        "wrist64_image": {"min": 0, "max": 255},
        "latent_wrist64_image": {"min": -8.0, "max": 8.0},
        "optimal": {"min": 0, "max": 1},
    },
    "actions": {"min": [-1.0] * 14, "max": [1.0] * 14},
}
