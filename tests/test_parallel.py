"""Multi-device sharding tests on the virtual 8-CPU mesh.

These exercise parallel/mesh.py + the env-sharded rollout engine against the
8 virtual devices the conftest forces — the same validation the driver's
``dryrun_multichip`` performs, but with explicit sharding assertions.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from latent_diffusion_planning_tpu.envs.lift import (LIFT_OBS_STATS,
                                                     LIFT_SHAPE_META, LiftEnv)
from latent_diffusion_planning_tpu.models.agents import LDPAgent
from latent_diffusion_planning_tpu.parallel import mesh as meshlib
from latent_diffusion_planning_tpu.rollout import engine

pytestmark = pytest.mark.slow  # compile-heavy: run with -m "not slow" for the fast tier


@pytest.fixture(scope="module")
def agent_batch():
    B, H = 8, 9
    rng = np.random.default_rng(0)
    batch = {
        "obs": {
            "robot0_eef_pos": jnp.asarray(rng.normal(size=(B, H, 3)) * 0.1
                                          + np.array([0, 0, 1.0]), jnp.float32),
            "robot0_eef_quat": jnp.tile(jnp.asarray([1.0, 0, 0, 0]),
                                        (B, H, 1)),
            "robot0_gripper_qpos": jnp.zeros((B, H, 2)),
            "latent_agentview_image": jnp.asarray(
                rng.normal(size=(B, H, 16)), jnp.float32)},
        "actions": jnp.asarray(np.clip(rng.normal(size=(B, H, 7)), -1, 1),
                               jnp.float32)}
    agent = LDPAgent.create(
        jax.random.PRNGKey(0), batch, LIFT_SHAPE_META,
        planner={"_target_": ("latent_diffusion_planning_tpu.models.nets."
                              "unet1d.ConditionalUnet1D"),
                 "down_dims": [8, 16], "kernel_size": 5, "n_groups": 4},
        idm_net={"_target_": ("latent_diffusion_planning_tpu.models.nets."
                              "mlp.MLPDiffusion"),
                 "n_blocks": 2, "hidden_dim": 32, "time_dim": 16},
        vae={"block_out_channels": [8] * 6, "norm_groups": 4},
        vae_feature_dim=16,
        lowdim_obs=["robot0_eef_pos", "robot0_eef_quat",
                    "robot0_gripper_qpos"],
        rgb_obs=["latent_agentview_image"],
        obs_normalization=LIFT_OBS_STATS,
        obs_horizon=1, pred_horizon=8, action_horizon=4,
        planner_n_diffusion_steps=8, idm_n_diffusion_steps=8,
        warmup_steps=2, decay_steps=10)
    return agent, batch


def test_eight_virtual_devices():
    assert jax.device_count() == 8
    assert jax.default_backend() == "cpu"


def test_dp_sharded_update(agent_batch):
    """Batch sharded over 8 dp devices; params replicated; grads all-reduce
    inside jit — output metrics replicated."""
    agent, batch = agent_batch
    mesh = meshlib.make_mesh()
    assert dict(mesh.shape) == {"dp": 8}
    agent_r = meshlib.replicate(agent, mesh)
    sharded = meshlib.shard_batch(jax.tree_util.tree_map(np.asarray, batch),
                                  mesh)
    leaf = sharded["actions"]
    assert len(leaf.sharding.device_set) == 8
    assert leaf.sharding.is_equivalent_to(
        NamedSharding(mesh, P("dp")), leaf.ndim)

    new_agent, metrics = agent_r.update(sharded, jax.random.PRNGKey(1), 0)
    assert np.isfinite(float(metrics["loss"]))
    # updated params stay replicated across all 8 devices
    p = jax.tree_util.tree_leaves(new_agent.planner_state.params)[0]
    assert len(p.sharding.device_set) == 8
    assert p.sharding.is_equivalent_to(NamedSharding(mesh, P()), p.ndim)


def test_dp_env_2d_mesh(agent_batch):
    """dp x env 2-D mesh: training shards over dp only (replicated on env)."""
    agent, batch = agent_batch
    devices = np.asarray(jax.devices()).reshape(4, 2)
    mesh = Mesh(devices, (meshlib.DP_AXIS, meshlib.ENV_AXIS))
    agent_r = meshlib.replicate(agent, mesh)
    sharded = meshlib.shard_batch(jax.tree_util.tree_map(np.asarray, batch),
                                  mesh, axis=meshlib.DP_AXIS)
    _, metrics = agent_r.update(sharded, jax.random.PRNGKey(1), 0)
    assert np.isfinite(float(metrics["loss"]))


def _const_policy(agent, obs_window, rng):
    """Deterministic policy (ignores rng) so sharded == unsharded exactly."""
    B = next(iter(obs_window.values())).shape[0]
    act = jnp.asarray([0.2, 0.1, -0.4, 0.0, 0.0, 0.0, 1.0])
    return jnp.tile(act, (B, 4, 1))


def test_env_sharded_rollout_matches_single_device(agent_batch):
    """The engine sharded over the env axis reproduces the single-device
    rollout exactly (episodes are seed-addressable and independent)."""
    agent, _ = agent_batch
    env = LiftEnv(render_images=False, episode_len=16)
    kw = dict(obs_horizon=1, action_horizon=4, episode_len=16,
              policy_obs_keys=("robot0_eef_pos",), policy=_const_policy)
    ref = engine.run_batched_eval(env, agent, 16, jax.random.PRNGKey(3), **kw)
    mesh = meshlib.make_env_mesh()
    out = engine.run_batched_eval(env, agent, 16, jax.random.PRNGKey(3),
                                  env_mesh=mesh, **kw)
    for key in ("success", "reward", "horizon"):
        np.testing.assert_allclose(np.asarray(out["per_episode"][key]),
                                   np.asarray(ref["per_episode"][key]),
                                   atol=1e-6)


def test_env_sharded_rollout_with_agent_policy(agent_batch):
    """Full LDP policy (diffusion sampling) under the env-sharded engine."""
    agent, _ = agent_batch
    env = LiftEnv(render_images=True, episode_len=8)
    mesh = meshlib.make_env_mesh()
    out = engine.run_batched_eval(
        env, agent, 16, jax.random.PRNGKey(4), obs_horizon=1,
        action_horizon=4, episode_len=8, env_mesh=mesh,
        policy_obs_keys=("robot0_eef_pos", "robot0_eef_quat",
                         "robot0_gripper_qpos", "agentview_image"))
    assert out["metrics"]["n_episodes"] == 16
    assert np.isfinite(out["per_episode"]["reward"]).all()
