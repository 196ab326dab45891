"""Can + Square task tests: success criteria and scripted experts."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from latent_diffusion_planning_tpu.envs.pick_place import (BIN_CENTER, CanEnv,
                                                           PEG_POS, SquareEnv)
from latent_diffusion_planning_tpu.rollout import engine

pytestmark = pytest.mark.slow  # compile-heavy: run with -m "not slow" for the fast tier


@pytest.fixture(scope="module")
def can_env():
    return CanEnv(render_images=False, episode_len=160)


@pytest.fixture(scope="module")
def square_env():
    return SquareEnv(render_images=False, episode_len=160)


def test_can_success_requires_release_in_bin(can_env):
    state, _ = can_env.reset(jax.random.PRNGKey(0))
    in_bin = state.replace(obj_pos=BIN_CENTER + jnp.asarray(
        [0.0, 0.0, can_env.obj_half]))
    assert bool(can_env.check_success(in_bin))
    held = in_bin.replace(grasped=jnp.ones((), bool))
    assert not bool(can_env.check_success(held))
    outside = in_bin.replace(obj_pos=in_bin.obj_pos + jnp.asarray([0.2, 0, 0]))
    assert not bool(can_env.check_success(outside))


def test_square_success_requires_alignment(square_env):
    state, _ = square_env.reset(jax.random.PRNGKey(0))
    on_peg = state.replace(obj_pos=PEG_POS + jnp.asarray([0.0, 0.0, 0.02]))
    assert bool(square_env.check_success(on_peg))
    off = on_peg.replace(obj_pos=on_peg.obj_pos + jnp.asarray([0.1, 0, 0]))
    assert not bool(square_env.check_success(off))


@pytest.mark.parametrize("env_name", ["can", "square"])
def test_scripted_expert(env_name, can_env, square_env):
    env = can_env if env_name == "can" else square_env
    out = engine.run_scripted_collection(env, 8, jax.random.PRNGKey(1),
                                         episode_len=160)
    success = np.asarray(out["success"]).any(axis=1)
    assert success.mean() >= 0.9, f"{env_name} expert {success.mean():.0%}"


def test_renders():
    for cls in (CanEnv, SquareEnv):
        env = cls(render_images=True, image_size=32, episode_len=10)
        _, obs = env.reset(jax.random.PRNGKey(0))
        img = np.asarray(obs["agentview_image"])
        assert img.shape == (32, 32, 3) and img.std() > 5
