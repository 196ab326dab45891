"""Physics-backed Lift env: force-based grasping end-to-end."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from latent_diffusion_planning_tpu.envs.lift_physics import LiftPhysicsEnv
from latent_diffusion_planning_tpu.rollout import engine

pytestmark = pytest.mark.slow  # compile-heavy: run with -m "not slow" for the fast tier


@pytest.fixture(scope="module")
def env():
    return LiftPhysicsEnv(render_images=False, episode_len=80)


def test_obs_surface_matches_lift(env):
    state, obs = env.reset(jax.random.PRNGKey(0))
    assert set(obs) == {"robot0_eef_pos", "robot0_eef_quat",
                        "robot0_joint_pos", "robot0_gripper_qpos", "object"}
    assert obs["robot0_joint_pos"].shape == (7,)
    assert obs["object"].shape == (10,)


def test_cube_is_dynamic(env):
    """Without a grasp the cube stays on the table when the eef moves."""
    state, _ = env.reset(jax.random.PRNGKey(0))
    z0 = float(state.bodies.pos[0, 2])
    for _ in range(5):
        state, obs, r, s = env.step(state,
                                    jnp.asarray([0, 0, 1.0, 0, 0, 0, -1.0]))
    assert abs(float(state.bodies.pos[0, 2]) - z0) < 0.005
    from latent_diffusion_planning_tpu.envs.lift_physics import PANDA_CHAIN
    from latent_diffusion_planning_tpu.envs.physics import kinematics as K
    eef, _ = K.eef_pose(PANDA_CHAIN, state.qpos)
    assert float(eef[2]) > 1.0   # arm tracked the upward command


def test_scripted_expert_force_grasps(env):
    out = engine.run_scripted_collection(env, 6, jax.random.PRNGKey(1),
                                         episode_len=80)
    success = np.asarray(out["success"]).any(axis=1)
    assert success.mean() == 1.0, f"physics expert {success.mean():.0%}"


def test_render(env):
    renv = LiftPhysicsEnv(render_images=True, image_size=32, episode_len=10)
    _, obs = renv.reset(jax.random.PRNGKey(0))
    img = np.asarray(obs["agentview_image"])
    assert img.shape == (32, 32, 3) and img.std() > 5
