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

pytestmark = pytest.mark.slow  # compile-heavy: run with -m "not slow" for the fast tier


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


def _with_cube(env, state, pos, left_grip=None, right_grip=None):
    """Re-pose the cube and (optionally) squeeze a gripper on it."""
    from latent_diffusion_planning_tpu.ops import rotations as rot

    left = state.left if left_grip is None else state.left.replace(
        grip=jnp.asarray(left_grip, jnp.float32))
    right = state.right if right_grip is None else state.right.replace(
        grip=jnp.asarray(right_grip, jnp.float32))
    bodies = env._bodies_from_arms(left, right, jnp.asarray(pos),
                                   rot.quat_identity())
    return state.replace(left=left, right=right, bodies=bodies)


def test_reward_ladder(env):
    """Every stage is a *contact* event (cube↔pad / cube↔table contacts,
    parity alohasim_env.py:145-167) — proximity alone scores nothing."""
    state, _ = env.reset(jax.random.PRNGKey(0))
    assert float(env.reward(state)) == 0.0

    r_tip, _ = B.eef(B.RIGHT_CHAIN, state.right)
    l_tip, _ = B.eef(B.LEFT_CHAIN, state.left)
    # cube at the right fingertip with open fingers: NO contact, no reward
    assert float(env.reward(_with_cube(env, state, r_tip))) == 0.0
    # squeeze the right fingers onto it (tips start ~0.3 m up): touch +
    # lifted = 2
    assert float(env.reward(_with_cube(env, state, r_tip,
                                       right_grip=0.0))) == 2.0
    # squeezed at the left fingertip: transferred + lifted = 4
    assert float(env.reward(_with_cube(env, state, l_tip,
                                       left_grip=0.0))) == 4.0
    # settled on the table far from both: 0 (slight penetration = the
    # physical resting contact)
    on_table = jnp.asarray([0.1, 0.5, CUBE_HALF - 1e-4])
    assert float(env.reward(_with_cube(env, state, on_table))) == 0.0
    # the intermediate on-table stage (1: touching while grounded) appears
    # during the scripted transfer as the right gripper squeezes the
    # grounded cube before lifting
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
