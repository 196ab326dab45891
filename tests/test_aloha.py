"""Bimanual ALOHA transfer-cube env tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from latent_diffusion_planning_tpu.envs.aloha_cube import (
    ALOHA_SHAPE_META, AlohaTransferCubeEnv, CUBE_HALF, TABLE_Z)
from latent_diffusion_planning_tpu.rollout import engine


@pytest.fixture(scope="module")
def env():
    return AlohaTransferCubeEnv(render_images=False, episode_len=120)


def test_reset_obs_shapes(env):
    state, obs = env.reset(jax.random.PRNGKey(0))
    assert obs["qpos"].shape == (14,)
    # cube spawns in the sample_box_pose range
    assert 0.0 <= float(state.cube_pos[0]) <= 0.2
    assert 0.4 <= float(state.cube_pos[1]) <= 0.6


def test_reward_ladder(env):
    state, _ = env.reset(jax.random.PRNGKey(0))
    # nothing touching: 0
    assert float(env.reward(state)) == 0.0
    # right gripper touching on the table: 1
    s1 = state.replace(right_pos=state.cube_pos)
    assert float(env.reward(s1)) == 1.0
    # right holding it up: 2
    up = state.cube_pos + jnp.asarray([0.0, 0.0, 0.2])
    s2 = state.replace(right_pos=up, cube_pos=up)
    assert float(env.reward(s2)) == 2.0
    # left touching (attempted transfer): 3 on table, 4 lifted
    s3 = state.replace(left_pos=state.cube_pos)
    assert float(env.reward(s3)) == 3.0
    s4 = state.replace(left_pos=up, cube_pos=up)
    assert float(env.reward(s4)) == 4.0


def test_scripted_transfer_succeeds(env):
    out = engine.run_scripted_collection(env, 8, jax.random.PRNGKey(1),
                                         episode_len=120)
    success = np.asarray(out["success"]).any(axis=1)
    assert success.mean() >= 0.9, f"transfer expert {success.mean():.0%}"
    assert out["actions"].shape == (8, 120, 14)
    # reward reaches the top of the ladder
    assert np.asarray(out["rewards"]).max() == 4.0


def test_render(env):
    renv = AlohaTransferCubeEnv(render_images=True, image_size=32,
                                episode_len=10)
    _, obs = renv.reset(jax.random.PRNGKey(0))
    img = np.asarray(obs["wrist64_image"])
    assert img.shape == (32, 32, 3)
    assert img.std() > 5
