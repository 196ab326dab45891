"""Device-resident bimanual ALOHA insertion task — joint-space dynamics.

Batched on-device counterpart of the reference's dm_control InsertionTask
(envs/alohasim_env.py:170-229): right gripper holds the red peg, left gripper
holds the socket; success is the peg entering the socket ("pin" contact).
Staged contact-reward ladder parity (reference :219-229):

  1 — both grippers touching their objects,
  2 — both objects grasped and off the table,
  3 — peg and socket touching (while both off the table),
  4 — peg inserted (pin depth reached)  → success.

Control/obs surface is the bimanual ViperX joint-space convention of
aloha_base.py (14-dim absolute joint-position targets + normalized grippers;
qpos/qvel/env_state/wrist64_image observations — envs/alohasim_env.py:19-35),
with seeded randomized spawns (alohasim_ee_env.sample_insertion_pose ranges)
and a two-arm IK scripted expert for demo generation.
"""

from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp

from ..ops import render as R
from ..ops import rotations as rot
from . import aloha_base as B

TABLE_Z = B.TABLE_Z
PEG_HALF = jnp.asarray([0.03, 0.01, 0.01])
SOCKET_HALF = jnp.asarray([0.03, 0.018, 0.018])
LIFT_EPS = 0.015
MEET_L = jnp.asarray([-0.06, 0.5, 0.30])   # socket meet pose (left arm)
MEET_R = jnp.asarray([0.06, 0.5, 0.30])    # peg meet pose (right arm)
INSERT_TOL_YZ = 0.012
INSERT_DEPTH = 0.035                        # peg tip into the socket


class AlohaInsertionState(flax.struct.PyTreeNode):
    left: B.ArmState
    right: B.ArmState
    peg_pos: jnp.ndarray
    socket_pos: jnp.ndarray
    peg_held: jnp.ndarray
    socket_held: jnp.ndarray
    t: jnp.ndarray


class AlohaInsertionEnv:
    obs_keys = ("qpos", "qvel", "env_state", "wrist64_image")
    action_dim = 14
    episode_len = 400
    max_reward = 4.0

    def __init__(self, image_size: int = 64, render_images: bool = True,
                 episode_len: int = 400, renderer: str = "xla",
                 camera_names: tuple = ("wrist64",),
                 mesh_mode: str = "box"):
        """``camera_names`` selects the observed cameras (reference surface:
        wrist64 + top/angle/front_close/left_pillar, alohasim_env.py:102-114
        — static ones render at their reference resolutions).
        ``mesh_mode='kdop'`` renders mesh-accurate ViperX link hulls
        (aloha_base.arm_scene_prims_kdop)."""
        self.image_size = image_size
        self.render_images = render_images
        self.episode_len = episode_len
        self.renderer = renderer
        self.camera_names = tuple(camera_names)
        self.mesh_mode = mesh_mode
        self.n_convex = 18 if mesh_mode == "kdop" else 0

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
            left=B.arm_reset(), right=B.arm_reset(),
            peg_pos=jnp.concatenate([peg_xy,
                                     jnp.asarray([TABLE_Z + PEG_HALF[2]])]),
            socket_pos=jnp.concatenate([sock_xy,
                                        jnp.asarray([TABLE_Z + SOCKET_HALF[2]])]),
            peg_held=jnp.zeros((), bool),
            socket_held=jnp.zeros((), bool),
            t=jnp.zeros((), jnp.int32))
        return state, self.obs(state)

    # ------------------------------------------------------------------
    def step(self, state: AlohaInsertionState, action: jnp.ndarray):
        left = B.arm_step(state.left, action[0:6], action[6])
        right = B.arm_step(state.right, action[7:13], action[13])

        # right arm handles the peg, left the socket (reference task roles)
        peg_held = B.holding(B.RIGHT_CHAIN, right, state.peg_pos,
                             state.peg_held)
        socket_held = B.holding(B.LEFT_CHAIN, left, state.socket_pos,
                                state.socket_held)
        l_tip, _ = B.eef(B.LEFT_CHAIN, left)
        r_tip, _ = B.eef(B.RIGHT_CHAIN, right)

        def fall(p, half_z):
            return p.at[2].set(jnp.maximum(p[2] - 0.02, TABLE_Z + half_z))

        peg = jnp.where(peg_held, r_tip, fall(state.peg_pos, PEG_HALF[2]))
        socket = jnp.where(socket_held, l_tip,
                           fall(state.socket_pos, SOCKET_HALF[2]))

        new_state = AlohaInsertionState(
            left=left, right=right, peg_pos=peg, socket_pos=socket,
            peg_held=peg_held, socket_held=socket_held, t=state.t + 1)
        reward = self.reward(new_state)
        success = reward >= self.max_reward
        return new_state, self.obs(new_state), reward, success

    def reward(self, state: AlohaInsertionState) -> jnp.ndarray:
        """Ladder parity: alohasim_env.py:219-229."""
        touch_r = B.touching(B.RIGHT_CHAIN, state.right, state.peg_pos)
        touch_l = B.touching(B.LEFT_CHAIN, state.left, state.socket_pos)
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
        out = {
            "qpos": B.qpos_obs(state.left, state.right),
            "qvel": B.qvel_obs(state.left, state.right),
            "env_state": jnp.concatenate([
                state.peg_pos, rot.quat_identity(),
                state.socket_pos, rot.quat_identity()]),
        }
        if self.render_images:
            scene = self.scene(state)
            views = B.camera_views(self.camera_names, state.right,
                                   self.image_size)
            for name, (cam, (h, w)) in views.items():
                out[f"{name}_image"] = R.render_scene(
                    scene, cam, h, w, backend=self.renderer,
                    n_convex=self.n_convex)
        return out

    def scene(self, state: AlohaInsertionState) -> R.Scene:
        if self.mesh_mode == "kdop":
            lp, lr, ls, lc, lpl = B.arm_scene_prims_kdop(
                B.LEFT_CHAIN, state.left, (0.25, 0.25, 0.35))
            rp, rr, rs, rc, rpl = B.arm_scene_prims_kdop(
                B.RIGHT_CHAIN, state.right, (0.2, 0.3, 0.2))
            n_planes = lpl.shape[1]
            obj_rows = jnp.zeros((2, n_planes, 4), jnp.float32
                                 ).at[:, :, 3].set(1.0)
            return R.Scene(
                pos=jnp.concatenate([lp, rp, state.peg_pos[None],
                                     state.socket_pos[None]]),
                rot=jnp.concatenate([lr, rr, jnp.eye(3)[None],
                                     jnp.eye(3)[None]]),
                size=jnp.concatenate([ls, rs, PEG_HALF[None],
                                      SOCKET_HALF[None]]),
                color=jnp.concatenate([lc, rc,
                                       jnp.asarray([[0.85, 0.1, 0.1],
                                                    [0.2, 0.3, 0.8]])]),
                kind=jnp.concatenate([jnp.full((18,), 2, jnp.int32),
                                      jnp.zeros((2,), jnp.int32)]),
                plane_z=jnp.asarray(TABLE_Z, jnp.float32),
                planes=jnp.concatenate([lpl, rpl, obj_rows]))
        lp, lr, ls, lc = B.arm_scene_prims(B.LEFT_CHAIN, state.left,
                                           (0.25, 0.25, 0.35))
        rp, rr, rs, rc = B.arm_scene_prims(B.RIGHT_CHAIN, state.right,
                                           (0.2, 0.3, 0.2))
        return R.Scene(
            pos=jnp.concatenate([state.peg_pos[None], state.socket_pos[None],
                                 lp, rp]),
            rot=jnp.concatenate([jnp.eye(3)[None], jnp.eye(3)[None], lr, rr]),
            size=jnp.concatenate([PEG_HALF[None], SOCKET_HALF[None], ls, rs]),
            color=jnp.concatenate([jnp.asarray([[0.85, 0.1, 0.1],
                                                [0.2, 0.3, 0.8]]), lc, rc]),
            kind=jnp.zeros((10,), jnp.int32),
            plane_z=jnp.asarray(TABLE_Z, jnp.float32))

    def render(self, state: AlohaInsertionState) -> jnp.ndarray:
        cam = B.wrist64_camera(state.right)
        return R.render_scene(self.scene(state), cam, self.image_size,
                              self.image_size, backend=self.renderer,
                              n_convex=self.n_convex)

    def get_state(self, state):
        return state

    def reset_to(self, state):
        """Deterministic state-injection reset (parity: the reference's
        reset_to replay, envs/robosuite_env.py:88-120) — envs are pure
        functions of their state pytree, so injecting a recorded state IS
        the reset; the paired obs comes from the same pure obs map."""
        return state, self.obs(state)


    # ------------------------------------------------------------------
    def scripted_action(self, state: AlohaInsertionState,
                        rng: jax.Array | None = None,
                        noise: float = 0.0) -> jnp.ndarray:
        """Two-arm insertion expert (parity: InsertionPolicy,
        collect_aloha_scripted_demos.py:110-152): each arm grasps its object,
        lifts to the meet height, then the right arm drives the peg in."""
        peg, sock = state.peg_pos, state.socket_pos
        l_tip, _ = B.eef(B.LEFT_CHAIN, state.left)
        r_tip, _ = B.eef(B.RIGHT_CHAIN, state.right)

        def arm_plan(tip, obj, held, meet):
            above = obj + jnp.asarray([0.0, 0.0, 0.07])
            xy_near = jnp.linalg.norm(obj[:2] - tip[:2]) < 0.015
            z_near = jnp.abs(obj[2] - tip[2]) < 0.015
            target = jnp.where(held, meet, jnp.where(xy_near, obj, above))
            grip = jnp.where(held | (xy_near & z_near), 0.0, 1.0)
            return target, grip

        both_up = state.peg_held & state.socket_held
        sock_at_meet = jnp.linalg.norm(sock - MEET_L) < 0.02
        # once both held and the socket is placed, the peg drives toward it
        insert_target = sock + jnp.asarray(
            [PEG_HALF[0] + SOCKET_HALF[0] - INSERT_DEPTH - 0.002, 0.0, 0.0])
        stage_r = MEET_R + jnp.asarray([0.06, 0.0, 0.0])
        r_meet = jnp.where(both_up & sock_at_meet, insert_target, stage_r)

        l_target, l_grip = arm_plan(l_tip, sock, state.socket_held, MEET_L)
        r_target, r_grip = arm_plan(r_tip, peg, state.peg_held, r_meet)

        ql = B.scripted_arm_action(B.LEFT_CHAIN, state.left, l_target)
        qr = B.scripted_arm_action(B.RIGHT_CHAIN, state.right, r_target)
        act = jnp.concatenate([ql, l_grip[None], qr, r_grip[None]])
        if noise > 0.0 and rng is not None:
            act = act + noise * jax.random.normal(rng, act.shape)
        return act
