"""Trajectory-replay regression: recorded action sequences must reproduce
recorded state trajectories.

The reference's contact-fidelity strategy is trajectory replay against
recorded MuJoCo demos (SURVEY.md §7 hard part 1); here the same harness
guards this framework's own dynamics — any change to servo gains, FK chains,
contact parameters, or integration semantics that shifts trajectories fails
these tests instead of silently degrading trained policies
(tests/fixtures/replay_golden.npz was recorded from the committed dynamics).
"""

from pathlib import Path

import jax
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # compile-heavy: run with -m "not slow" for the fast tier

FIXTURE = Path(__file__).parent / "fixtures" / "replay_golden.npz"


@pytest.fixture(scope="module")
def golden():
    return np.load(FIXTURE)


def test_aloha_replay_matches(golden):
    from latent_diffusion_planning_tpu.envs.aloha_cube import (
        AlohaTransferCubeEnv)

    env = AlohaTransferCubeEnv(render_images=False, episode_len=50)
    state, _ = env.reset(jax.random.PRNGKey(11))
    actions = golden["aloha_actions"]
    qpos, cube, rewards = [], [], []
    step = jax.jit(env.step)
    for t in range(len(actions)):
        state, obs, r, _ = step(state, actions[t])
        qpos.append(np.asarray(obs["qpos"]))
        cube.append(np.asarray(state.cube_pos))
        rewards.append(float(r))
    np.testing.assert_allclose(np.stack(qpos), golden["aloha_qpos"],
                               atol=1e-5)
    np.testing.assert_allclose(np.stack(cube), golden["aloha_cube"],
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(rewards), golden["aloha_rewards"],
                               atol=1e-6)


def test_lift_physics_replay_matches(golden):
    from latent_diffusion_planning_tpu.envs.lift_physics import LiftPhysicsEnv

    env = LiftPhysicsEnv(render_images=False, episode_len=40)
    state, _ = env.reset(jax.random.PRNGKey(5))
    actions = golden["lift_actions"]
    eef, cube, rewards = [], [], []
    step = jax.jit(env.step)
    for t in range(len(actions)):
        state, obs, r, _ = step(state, actions[t])
        eef.append(np.asarray(obs["robot0_eef_pos"]))
        cube.append(np.asarray(state.bodies.pos[0]))
        rewards.append(float(r))
    # contact physics accumulates fp noise across 400 substeps — positions
    # must track to sub-millimeter, rewards to shaping tolerance
    np.testing.assert_allclose(np.stack(eef), golden["lift_eef"], atol=1e-4)
    np.testing.assert_allclose(np.stack(cube), golden["lift_cube"], atol=1e-3)
    np.testing.assert_allclose(np.asarray(rewards), golden["lift_rewards"],
                               atol=1e-3)
