"""Bimanual insertion task tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from latent_diffusion_planning_tpu.envs.aloha_insertion import (
    AlohaInsertionEnv, MEET_L, PEG_HALF, SOCKET_HALF, INSERT_DEPTH)
from latent_diffusion_planning_tpu.rollout import engine


@pytest.fixture(scope="module")
def env():
    return AlohaInsertionEnv(render_images=False, episode_len=160)


def test_reset_spawn_sides(env):
    state, obs = env.reset(jax.random.PRNGKey(0))
    assert float(state.peg_pos[0]) > 0.05      # peg right
    assert float(state.socket_pos[0]) < -0.05  # socket left
    assert obs["qpos"].shape == (14,)


def test_reward_ladder(env):
    state, _ = env.reset(jax.random.PRNGKey(0))
    assert float(env.reward(state)) == 0.0
    s1 = state.replace(left_pos=state.socket_pos, right_pos=state.peg_pos)
    assert float(env.reward(s1)) == 1.0
    up = jnp.asarray([0.0, 0.0, 0.2])
    s2 = s1.replace(peg_pos=s1.peg_pos + up, socket_pos=s1.socket_pos + up,
                    right_pos=s1.right_pos + up, left_pos=s1.left_pos + up)
    assert float(env.reward(s2)) == 2.0
    # inserted: peg overlapping socket along x, aligned in y/z
    sock = MEET_L
    peg = sock + jnp.asarray(
        [float(PEG_HALF[0] + SOCKET_HALF[0]) - INSERT_DEPTH - 0.003, 0, 0])
    s4 = s2.replace(socket_pos=sock, peg_pos=peg, left_pos=sock,
                    right_pos=peg)
    assert float(env.reward(s4)) == 4.0


def test_scripted_insertion_expert(env):
    out = engine.run_scripted_collection(env, 8, jax.random.PRNGKey(1),
                                         episode_len=160)
    success = np.asarray(out["success"]).any(axis=1)
    assert success.mean() >= 0.9, f"insertion expert {success.mean():.0%}"
