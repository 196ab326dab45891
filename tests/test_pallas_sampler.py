"""Fused Pallas reverse-diffusion samplers vs the XLA scan samplers.

The fused kernels consume the same rng draws as ops.diffusion.sample_ddpm /
sample_ddim, so outputs must match to fp32 matmul tolerance (interpret mode
on CPU; matmul precision pinned because XLA CPU's default f32 dot is low
precision and chaotic through the x0-clip).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from latent_diffusion_planning_tpu.models.nets.mlp import MLPDiffusion
from latent_diffusion_planning_tpu.models.nets.unet1d import ConditionalUnet1D
from latent_diffusion_planning_tpu.ops import diffusion as dlib
from latent_diffusion_planning_tpu.ops.pallas.diffusion_mlp import (
    fused_mlp_diffusion_sample)
from latent_diffusion_planning_tpu.ops.pallas.diffusion_unet1d import (
    fused_unet1d_ddim_sample)
pytestmark = pytest.mark.slow  # compile-heavy: run with -m "not slow" for the fast tier



@pytest.fixture(autouse=True)
def _precise_matmul():
    with jax.default_matmul_precision("highest"):
        yield


def _idm_setup(N=32, A=7, S=20):
    net = MLPDiffusion(out_dim=A, n_blocks=2, hidden_dim=32, time_dim=16)
    rng = jax.random.PRNGKey(0)
    s = jax.random.normal(rng, (N, S))
    params = net.init(rng, s[:2], jnp.zeros((2, A)),
                      jnp.zeros((2, 1), jnp.int32))["params"]
    sched = dlib.DiffusionSchedule.create(12, "squaredcos_cap_v2")
    return net, params, s, sched, N, A


@pytest.mark.parametrize("mode", ["ddim", "ddpm"])
def test_fused_idm_matches_xla(mode):
    net, params, s, sched, N, A = _idm_setup()
    key = jax.random.PRNGKey(42)

    def denoise(a, t):
        return net.apply({"params": params}, s, a, t)

    if mode == "ddim":
        n_inf = 4
        ref = dlib.sample_ddim(sched, denoise, key, (N, A), n_inf)
        ts, coefs = dlib.ddim_coef_table(sched, n_inf)
    else:
        ref = dlib.sample_ddpm(sched, denoise, key, (N, A))
        ts, coefs = dlib.ddpm_coef_table(sched)
    T = int(ts.shape[0])
    k, init_rng = jax.random.split(key)
    x0 = jax.random.normal(init_rng, (N, A), jnp.float32)
    if mode == "ddim":
        noise = jnp.zeros((T, N, A))
    else:
        noise = jax.vmap(lambda kk: jax.random.normal(kk, (N, A)))(
            jax.random.split(k, T))
    fused = fused_mlp_diffusion_sample(params, s, x0, ts, coefs, noise,
                                       tile=N, interpret=True)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref),
                               atol=2e-4, rtol=0)


def test_fused_unet_ddim_matches_xla():
    B, T, D, Dc = 4, 8, 5, 5
    net = ConditionalUnet1D(input_dim=D, down_dims=(8, 16, 32),
                            kernel_size=5, n_groups=4)
    rng = jax.random.PRNGKey(0)
    gcond = jax.random.normal(rng, (B, Dc))
    params = net.init(rng, jnp.zeros((2, T, D)), jnp.zeros((2,), jnp.int32),
                      jnp.zeros((2, Dc)))["params"]
    sched = dlib.DiffusionSchedule.create(12, "squaredcos_cap_v2")

    def denoise(x, t):
        return net.apply({"params": params}, x, t, gcond)

    key = jax.random.PRNGKey(7)
    ref = dlib.sample_ddim(sched, denoise, key, (B, T, D), 4)
    ts, coefs = dlib.ddim_coef_table(sched, 4)
    _, init_rng = jax.random.split(key)
    x0 = jax.random.normal(init_rng, (B, T, D), jnp.float32)
    fused = fused_unet1d_ddim_sample(params, gcond, x0, ts, coefs,
                                     down_dims=(8, 16, 32), n_groups=4,
                                     batch_tile=B, interpret=True)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref),
                               atol=2e-4, rtol=0)


@pytest.mark.parametrize("bundle_bytes,tile", [
    (12 * 2**20, 4),   # one real bundle + parity dummy (exercises finish())
    (4096, 4),         # many small bundles: full double-buffer chain
    (4096, 2),         # grid of 2 programs, each streaming the tape
])
def test_fused_unet_streamed_matches_xla(bundle_bytes, tile):
    """HBM-tape weight streaming reproduces the XLA sampler bit-for-tol.

    The streamed mode exists for nets over the VMEM-resident budget
    (reference-scale [256,512,1024], VERDICT r4 weak 5); parity is probed on
    a small net by forcing streaming=True with the bundle size driven down
    so the double-buffered DMA schedule (warm-up, per-bundle wait/prefetch,
    parity padding, drain) is fully exercised in interpret mode.
    """
    B, T, D, Dc = 4, 8, 5, 5
    net = ConditionalUnet1D(input_dim=D, down_dims=(8, 16, 32),
                            kernel_size=5, n_groups=4)
    rng = jax.random.PRNGKey(0)
    gcond = jax.random.normal(rng, (B, Dc))
    params = net.init(rng, jnp.zeros((2, T, D)), jnp.zeros((2,), jnp.int32),
                      jnp.zeros((2, Dc)))["params"]
    sched = dlib.DiffusionSchedule.create(12, "squaredcos_cap_v2")

    def denoise(x, t):
        return net.apply({"params": params}, x, t, gcond)

    key = jax.random.PRNGKey(7)
    ref = dlib.sample_ddim(sched, denoise, key, (B, T, D), 4)
    ts, coefs = dlib.ddim_coef_table(sched, 4)
    _, init_rng = jax.random.split(key)
    x0 = jax.random.normal(init_rng, (B, T, D), jnp.float32)
    fused = fused_unet1d_ddim_sample(params, gcond, x0, ts, coefs,
                                     down_dims=(8, 16, 32), n_groups=4,
                                     batch_tile=tile, streaming=True,
                                     stream_bundle_bytes=bundle_bytes,
                                     interpret=True)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref),
                               atol=2e-4, rtol=0)


def test_coef_tables_match_step_rules():
    """The unified (c1, c2, m_x0, m_xt, s_var) tables reproduce ddpm_step /
    ddim_step exactly for a random (x, eps) pair at every timestep."""
    sched = dlib.DiffusionSchedule.create(10, "squaredcos_cap_v2")
    rng = jax.random.PRNGKey(3)
    x = jax.random.normal(rng, (10, 4))
    eps = jax.random.normal(jax.random.PRNGKey(4), (10, 4))

    ts, coefs = dlib.ddpm_coef_table(sched)
    for i in range(int(ts.shape[0])):
        t = jnp.full((10,), ts[i], jnp.int32)
        # noise-free comparison: subtract the stochastic term from ddpm_step
        ref = sched.ddpm_step(eps, x, t, jax.random.PRNGKey(0))
        noise = jax.random.normal(jax.random.PRNGKey(0), x.shape, x.dtype)
        ref = ref - jnp.where(ts[i] > 0, 1.0, 0.0) * jnp.sqrt(jnp.clip(
            sched.betas[ts[i]] * (1 - (sched.alphas_cumprod[ts[i] - 1]
                                       if ts[i] > 0 else 1.0))
            / (1 - sched.alphas_cumprod[ts[i]]), 1e-20)) * noise
        x0 = jnp.clip(coefs[i, 0] * (x - coefs[i, 1] * eps), -1, 1)
        got = coefs[i, 2] * x0 + coefs[i, 3] * x
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)

    ts, coefs = dlib.ddim_coef_table(sched, 5)
    ts_prev = jnp.concatenate([ts[1:], jnp.full((1,), -1, jnp.int32)])
    for i in range(5):
        t = jnp.full((10,), ts[i], jnp.int32)
        tp = jnp.full((10,), ts_prev[i], jnp.int32)
        ref = sched.ddim_step(eps, x, t, tp)
        x0 = jnp.clip(coefs[i, 0] * (x - coefs[i, 1] * eps), -1, 1)
        got = coefs[i, 2] * x0 + coefs[i, 3] * x
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_agent_fused_sampler_integration():
    """LDPAgent with fused_sampler=True (interpret on CPU) matches the XLA
    path through the full sample_fast inference."""
    from latent_diffusion_planning_tpu.envs.lift import (LIFT_OBS_STATS,
                                                         LIFT_SHAPE_META)
    from latent_diffusion_planning_tpu.models.agents import LDPAgent

    B, H = 4, 9
    rng = np.random.default_rng(0)
    batch = {"obs": {
        "robot0_eef_pos": jnp.asarray(rng.normal(size=(B, H, 3)) * 0.1
                                      + np.array([0, 0, 1.0]), jnp.float32),
        "robot0_eef_quat": jnp.tile(jnp.asarray([1.0, 0, 0, 0]), (B, H, 1)),
        "robot0_gripper_qpos": jnp.zeros((B, H, 2)),
        "latent_agentview_image": jnp.asarray(rng.normal(size=(B, H, 16)),
                                              jnp.float32)},
        "actions": jnp.asarray(np.clip(rng.normal(size=(B, H, 7)), -1, 1),
                               jnp.float32)}

    def make(fused):
        return LDPAgent.create(
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
            planner_n_diffusion_steps=12, idm_n_diffusion_steps=12,
            planner_inference_steps=4, idm_inference_steps=4,
            warmup_steps=2, decay_steps=10,
            fused_sampler=fused, fused_dtype="float32")

    a_x = make(False)
    a_f = make(True)
    assert a_f.config.fused_idm and a_f.config.fused_planner
    assert not (a_x.config.fused_idm or a_x.config.fused_planner)
    window = {k: v[:, :1] for k, v in batch["obs"].items()
              if k != "latent_agentview_image"}
    window["agentview_image"] = jnp.asarray(
        rng.uniform(0, 255, size=(B, 1, 64, 64, 3)), jnp.float32)
    k = jax.random.PRNGKey(5)
    ref = a_x.sample_fast({"obs": window}, k)
    got = a_f.sample_fast({"obs": window}, k)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=5e-3, rtol=0)
