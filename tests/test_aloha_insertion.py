"""Bimanual insertion task tests (joint-space dynamics)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from latent_diffusion_planning_tpu.envs import aloha_base as B
from latent_diffusion_planning_tpu.envs.aloha_insertion import (
    INSERT_DEPTH, MEET_L, PEG_HALF, SOCKET_HALF, AlohaInsertionEnv)
from latent_diffusion_planning_tpu.rollout import engine

pytestmark = pytest.mark.slow  # compile-heavy: run with -m "not slow" for the fast tier


@pytest.fixture(scope="module")
def env():
    return AlohaInsertionEnv(render_images=False, episode_len=160)


def test_reset_spawn_sides(env):
    state, obs = env.reset(jax.random.PRNGKey(0))
    assert float(state.peg_pos[0]) > 0.05      # peg right
    assert float(state.socket_pos[0]) < -0.05  # socket left
    assert obs["qpos"].shape == (14,)
    assert obs["env_state"].shape == (14,)     # two object poses


def test_reward_ladder(env):
    state, _ = env.reset(jax.random.PRNGKey(0))
    assert float(env.reward(state)) == 0.0
    # objects moved onto the fingertips (tips start ~0.3 m up): both
    # touching + lifted = 2
    l_tip, _ = B.eef(B.LEFT_CHAIN, state.left)
    r_tip, _ = B.eef(B.RIGHT_CHAIN, state.right)
    s2 = state.replace(peg_pos=r_tip, socket_pos=l_tip)
    assert float(env.reward(s2)) == 2.0
    # inserted: peg overlapping socket along x, aligned in y/z = 4
    sock = l_tip
    peg = sock + jnp.asarray(
        [float(PEG_HALF[0] + SOCKET_HALF[0]) - INSERT_DEPTH - 0.003, 0, 0])
    s4 = s2.replace(socket_pos=sock, peg_pos=peg)
    assert float(env.reward(s4)) == 4.0
    # the on-table touching stage (1) appears during the scripted episode
    out = engine.run_scripted_collection(env, 2, jax.random.PRNGKey(3),
                                         episode_len=160)
    seen = set(np.unique(np.asarray(out["rewards"])).tolist())
    assert 4.0 in seen and 1.0 in seen


def test_scripted_insertion_expert(env):
    out = engine.run_scripted_collection(env, 8, jax.random.PRNGKey(1),
                                         episode_len=160)
    success = np.asarray(out["success"]).any(axis=1)
    assert success.mean() >= 0.9, f"insertion expert {success.mean():.0%}"
    assert out["actions"].shape == (8, 160, 14)
