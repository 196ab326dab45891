"""Device-resident bimanual ALOHA insertion task.

Batched on-device counterpart of the reference's dm_control InsertionTask
(envs/alohasim_env.py:170-229): right gripper holds the red peg, left gripper
holds the socket; success is the peg entering the socket ("pin" contact).
Staged contact-reward ladder parity (reference :219-229):

  1 — both grippers touching their objects,
  2 — both objects grasped and off the table,
  3 — peg and socket touching (while both off the table),
  4 — peg inserted (pin depth reached)  → success.

Same simplified bimanual task-space arm model as aloha_cube.py (the 14-dim
action interface), same qpos/wrist64 obs surface, seeded randomized spawns
(parity: alohasim_ee_env.sample_insertion_pose ranges), and a two-arm
scripted expert for demo generation.
"""

from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp

from ..ops import render as R
from .aloha_cube import (EEF_SPEED, GRIPPER_SPEED, GRASP_RADIUS, TABLE_Z,
                         TOUCH_RADIUS, WORK_HI, WORK_LO)

PEG_HALF = jnp.asarray([0.03, 0.01, 0.01])
SOCKET_HALF = jnp.asarray([0.03, 0.018, 0.018])
LIFT_EPS = 0.015
MEET_L = jnp.asarray([-0.06, 0.5, 0.30])   # socket meet pose (left arm)
MEET_R = jnp.asarray([0.06, 0.5, 0.30])    # peg meet pose (right arm)
INSERT_TOL_YZ = 0.012
INSERT_DEPTH = 0.035                        # peg tip into the socket


class AlohaInsertionState(flax.struct.PyTreeNode):
    left_pos: jnp.ndarray
    left_grip: jnp.ndarray
    right_pos: jnp.ndarray
    right_grip: jnp.ndarray
    peg_pos: jnp.ndarray
    socket_pos: jnp.ndarray
    peg_held: jnp.ndarray
    socket_held: jnp.ndarray
    t: jnp.ndarray


class AlohaInsertionEnv:
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
        # spawn ranges parity: alohasim_ee_env.sample_insertion_pose
        # peg x ∈ [0.1, 0.2] (right side), socket x ∈ [-0.2, -0.1] (left)
        pr, sr = jax.random.split(rng)
        peg_xy = jnp.stack([jax.random.uniform(pr, (), minval=0.1, maxval=0.2),
                            jax.random.uniform(jax.random.fold_in(pr, 1), (),
                                               minval=0.4, maxval=0.6)])
        sock_xy = jnp.stack([jax.random.uniform(sr, (), minval=-0.2,
                                                maxval=-0.1),
                             jax.random.uniform(jax.random.fold_in(sr, 1), (),
                                                minval=0.4, maxval=0.6)])
        state = AlohaInsertionState(
            left_pos=jnp.asarray([-0.25, 0.5, 0.25]),
            left_grip=jnp.ones(()),
            right_pos=jnp.asarray([0.25, 0.5, 0.25]),
            right_grip=jnp.ones(()),
            peg_pos=jnp.concatenate([peg_xy, jnp.asarray([TABLE_Z + PEG_HALF[2]])]),
            socket_pos=jnp.concatenate([sock_xy,
                                        jnp.asarray([TABLE_Z + SOCKET_HALF[2]])]),
            peg_held=jnp.zeros((), bool),
            socket_held=jnp.zeros((), bool),
            t=jnp.zeros((), jnp.int32))
        return state, self.obs(state)

    # ------------------------------------------------------------------
    def step(self, state: AlohaInsertionState, action: jnp.ndarray):
        action = jnp.clip(action, -1.0, 1.0)
        left = jnp.clip(state.left_pos + action[0:3] * EEF_SPEED,
                        WORK_LO, WORK_HI)
        right = jnp.clip(state.right_pos + action[7:10] * EEF_SPEED,
                         WORK_LO, WORK_HI)
        l_target = jnp.where(action[6] > 0, 0.0, 1.0)
        r_target = jnp.where(action[13] > 0, 0.0, 1.0)
        lg = state.left_grip + jnp.clip(l_target - state.left_grip,
                                        -GRIPPER_SPEED, GRIPPER_SPEED)
        rg = state.right_grip + jnp.clip(r_target - state.right_grip,
                                         -GRIPPER_SPEED, GRIPPER_SPEED)

        # right arm handles the peg, left the socket (reference task roles)
        r_near = jnp.linalg.norm(state.peg_pos - right) < GRASP_RADIUS
        l_near = jnp.linalg.norm(state.socket_pos - left) < GRASP_RADIUS
        peg_held = jnp.where(state.peg_held, rg < 0.4, r_near & (rg < 0.4))
        socket_held = jnp.where(state.socket_held, lg < 0.4,
                                l_near & (lg < 0.4))

        def fall(p, half_z):
            return p.at[2].set(jnp.maximum(p[2] - 0.02, TABLE_Z + half_z))

        peg = jnp.where(peg_held, right, fall(state.peg_pos, PEG_HALF[2]))
        socket = jnp.where(socket_held, left,
                           fall(state.socket_pos, SOCKET_HALF[2]))

        new_state = AlohaInsertionState(
            left_pos=left, left_grip=lg, right_pos=right, right_grip=rg,
            peg_pos=peg, socket_pos=socket, peg_held=peg_held,
            socket_held=socket_held, t=state.t + 1)
        reward = self.reward(new_state)
        success = reward >= self.max_reward
        return new_state, self.obs(new_state), reward, success

    def reward(self, state: AlohaInsertionState) -> jnp.ndarray:
        """Ladder parity: alohasim_env.py:219-229."""
        touch_r = (jnp.linalg.norm(state.peg_pos - state.right_pos)
                   < TOUCH_RADIUS)
        touch_l = (jnp.linalg.norm(state.socket_pos - state.left_pos)
                   < TOUCH_RADIUS)
        peg_up = state.peg_pos[2] > TABLE_Z + PEG_HALF[2] + LIFT_EPS
        sock_up = state.socket_pos[2] > TABLE_Z + SOCKET_HALF[2] + LIFT_EPS
        delta = state.peg_pos - state.socket_pos
        # peg approaches socket mouth from +x
        gap = delta[0] - (PEG_HALF[0] + SOCKET_HALF[0])
        aligned = jnp.all(jnp.abs(delta[1:]) < INSERT_TOL_YZ)
        touching = (gap < 0.005) & aligned & peg_up & sock_up
        inserted = (delta[0] < PEG_HALF[0] + SOCKET_HALF[0] - INSERT_DEPTH) \
            & aligned & peg_up & sock_up
        r = jnp.zeros(())
        r = jnp.where(touch_l & touch_r, 1.0, r)
        r = jnp.where(touch_l & touch_r & peg_up & sock_up, 2.0, r)
        r = jnp.where(touching, 3.0, r)
        r = jnp.where(inserted, 4.0, r)
        return r

    # ------------------------------------------------------------------
    def obs(self, state: AlohaInsertionState) -> dict:
        qpos = jnp.concatenate([
            state.left_pos, state.socket_pos - state.left_pos,
            state.left_grip[None],
            state.right_pos, state.peg_pos - state.right_pos,
            state.right_grip[None]])
        out = {"qpos": qpos}
        if self.render_images:
            out["wrist64_image"] = self.render(state)
        return out

    def render(self, state: AlohaInsertionState) -> jnp.ndarray:
        scene = R.Scene(
            pos=jnp.stack([state.peg_pos, state.socket_pos,
                           state.left_pos, state.right_pos]),
            rot=jnp.stack([jnp.eye(3)] * 4),
            size=jnp.stack([PEG_HALF, SOCKET_HALF,
                            jnp.asarray([0.012, 0.018, 0.012]),
                            jnp.asarray([0.012, 0.018, 0.012])]),
            color=jnp.asarray([[0.85, 0.1, 0.1],      # red peg
                               [0.2, 0.3, 0.8],       # blue socket
                               [0.15, 0.15, 0.4], [0.15, 0.4, 0.15]]),
            kind=jnp.zeros((4,), jnp.int32),
            plane_z=jnp.asarray(TABLE_Z, jnp.float32))
        return R.render_scene(scene, self.camera, self.image_size,
                              self.image_size, backend=self.renderer)

    def get_state(self, state):
        return state

    # ------------------------------------------------------------------
    def scripted_action(self, state: AlohaInsertionState,
                        rng: jax.Array | None = None,
                        noise: float = 0.0) -> jnp.ndarray:
        """Two-arm insertion expert (parity: InsertionPolicy,
        collect_aloha_scripted_demos.py:110-152): each arm grasps its object,
        lifts to the meet height, then the right arm drives the peg in."""
        peg, sock = state.peg_pos, state.socket_pos

        def arm_plan(eef, obj, held, meet, approach_from):
            above = obj + jnp.asarray([0.0, 0.0, 0.07])
            xy_near = jnp.linalg.norm(obj[:2] - eef[:2]) < 0.01
            z_near = jnp.abs(obj[2] - eef[2]) < 0.012
            target = jnp.where(held, meet, jnp.where(xy_near, obj, above))
            close = jnp.where(held | (xy_near & z_near), 1.0, -1.0)
            return target, close

        both_up = state.peg_held & state.socket_held
        sock_at_meet = jnp.linalg.norm(sock - MEET_L) < 0.02
        # once both held and the socket is placed, the peg drives toward it
        insert_target = sock + jnp.asarray(
            [PEG_HALF[0] + SOCKET_HALF[0] - INSERT_DEPTH - 0.002, 0.0, 0.0])
        stage_r = MEET_R + jnp.asarray([0.06, 0.0, 0.0])
        r_meet = jnp.where(both_up & sock_at_meet, insert_target, stage_r)

        l_target, l_close = arm_plan(state.left_pos, sock,
                                     state.socket_held, MEET_L, -1.0)
        r_target, r_close = arm_plan(state.right_pos, peg,
                                     state.peg_held, r_meet, 1.0)

        l_delta = jnp.clip((l_target - state.left_pos) / EEF_SPEED, -1, 1)
        r_delta = jnp.clip((r_target - state.right_pos) / EEF_SPEED, -1, 1)
        act = jnp.concatenate([l_delta, jnp.zeros(3), l_close[None],
                               r_delta, jnp.zeros(3), r_close[None]])
        if noise > 0.0 and rng is not None:
            act = act + noise * jax.random.normal(rng, act.shape)
        return jnp.clip(act, -1.0, 1.0)
