"""Bimanual ALOHA transfer-cube env tests (joint-space dynamics)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from latent_diffusion_planning_tpu.envs import aloha_base as B
from latent_diffusion_planning_tpu.envs import aloha_constants as C
from latent_diffusion_planning_tpu.envs.aloha_cube import (
    ALOHA_SHAPE_META, CUBE_HALF, AlohaTransferCubeEnv)
from latent_diffusion_planning_tpu.rollout import engine


@pytest.fixture(scope="module")
def env():
    return AlohaTransferCubeEnv(render_images=False, episode_len=120)


def test_reset_obs_shapes(env):
    state, obs = env.reset(jax.random.PRNGKey(0))
    assert obs["qpos"].shape == (14,)
    assert obs["qvel"].shape == (14,)
    assert obs["env_state"].shape == (7,)
    # cube spawns in the sample_box_pose range
    assert 0.0 <= float(state.cube_pos[0]) <= 0.2
    assert 0.4 <= float(state.cube_pos[1]) <= 0.6
    # qpos is TRUE joint space: arms at START_ARM_POSE, grippers at the
    # normalized start position (reference get_qpos convention)
    np.testing.assert_allclose(np.asarray(obs["qpos"][:6]),
                               np.asarray(C.START_ARM_QPOS), atol=1e-6)
    assert abs(float(obs["qpos"][6]) - C.START_GRIPPER_NORMALIZED) < 1e-5


def test_action_is_joint_position_target(env):
    """Commanding a waist target rotates the waist joint toward it."""
    state, _ = env.reset(jax.random.PRNGKey(0))
    act = jnp.concatenate([C.START_ARM_QPOS, jnp.asarray([1.0]),
                           C.START_ARM_QPOS, jnp.asarray([1.0])])
    act = act.at[0].set(0.5)  # left waist target
    for _ in range(10):
        state, obs, _, _ = env.step(state, act)
    assert abs(float(state.left.qpos[0]) - 0.5) < 0.01
    # limits clamp: an out-of-range shoulder command saturates at the limit
    act2 = act.at[1].set(5.0)
    for _ in range(10):
        state, _, _, _ = env.step(state, act2)
    assert float(state.left.qpos[1]) <= float(C.ARM_JOINT_HI[1]) + 1e-5


def test_gripper_normalization_tables():
    """Round-trips of the reference's calibration tables."""
    x = jnp.linspace(0.0, 1.0, 5)
    pos = C.puppet_gripper_position_unnormalize(x)
    np.testing.assert_allclose(
        np.asarray(C.puppet_gripper_position_normalize(pos)), np.asarray(x),
        atol=1e-6)
    assert abs(float(C.puppet_gripper_position_unnormalize(0.0))
               - C.PUPPET_GRIPPER_POSITION_CLOSE) < 1e-7
    assert abs(float(C.puppet_gripper_position_unnormalize(1.0))
               - C.PUPPET_GRIPPER_POSITION_OPEN) < 1e-7
    assert abs(float(C.master2puppet_position(C.MASTER_GRIPPER_POSITION_OPEN))
               - C.PUPPET_GRIPPER_POSITION_OPEN) < 1e-6


def test_reward_ladder(env):
    state, _ = env.reset(jax.random.PRNGKey(0))
    assert float(env.reward(state)) == 0.0

    # cube at the right fingertip (tips start ~0.3 m up): touching + lifted = 2
    r_tip, _ = B.eef(B.RIGHT_CHAIN, state.right)
    assert float(env.reward(state.replace(cube_pos=r_tip))) == 2.0
    # at the left fingertip: transferred + lifted = 4
    l_tip, _ = B.eef(B.LEFT_CHAIN, state.left)
    assert float(env.reward(state.replace(cube_pos=l_tip))) == 4.0
    # on the table far from both: 0
    on_table = jnp.asarray([0.1, 0.5, CUBE_HALF])
    assert float(env.reward(state.replace(cube_pos=on_table))) == 0.0
    # the intermediate on-table stages (1 and 3) appear during the scripted
    # transfer as the grippers touch the grounded cube before lifting
    out = engine.run_scripted_collection(env, 2, jax.random.PRNGKey(3),
                                         episode_len=120)
    seen = set(np.unique(np.asarray(out["rewards"])).tolist())
    assert 4.0 in seen and 1.0 in seen


def test_scripted_transfer_succeeds(env):
    out = engine.run_scripted_collection(env, 8, jax.random.PRNGKey(1),
                                         episode_len=120)
    success = np.asarray(out["success"]).any(axis=1)
    assert success.mean() >= 0.9, f"transfer expert {success.mean():.0%}"
    assert out["actions"].shape == (8, 120, 14)
    # actions are joint-space: arm channels stay within the joint limits
    acts = np.asarray(out["actions"])
    lo = np.asarray(C.ARM_JOINT_LO)
    hi = np.asarray(C.ARM_JOINT_HI)
    assert (acts[..., :6] >= lo - 1e-4).all()
    assert (acts[..., :6] <= hi + 1e-4).all()
    assert ((acts[..., 6] >= -1e-6) & (acts[..., 6] <= 1 + 1e-6)).all()
    # reward reaches the top of the ladder
    assert np.asarray(out["rewards"]).max() == 4.0


def test_render(env):
    renv = AlohaTransferCubeEnv(render_images=True, image_size=32,
                                episode_len=10)
    _, obs = renv.reset(jax.random.PRNGKey(0))
    img = np.asarray(obs["wrist64_image"])
    assert img.shape == (32, 32, 3)
    assert img.std() > 5


def test_shape_meta_matches_obs(env):
    _, obs = env.reset(jax.random.PRNGKey(0))
    for key in ("qpos", "qvel", "env_state"):
        assert list(obs[key].shape) == ALOHA_SHAPE_META["all_shapes"][key]
