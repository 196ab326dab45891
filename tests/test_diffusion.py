"""Golden-value tests for the in-house DDPM/DDIM schedules.

Verifies the closed-form cosine (squaredcos_cap_v2) schedule, add_noise, x0
reconstruction, DDPM posterior coefficients, and that full reverse sampling
with an oracle denoiser recovers the data distribution.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from latent_diffusion_planning_tpu.ops import diffusion as dlib


def _alpha_bar(x):
    return math.cos((x + 0.008) / 1.008 * math.pi / 2.0) ** 2


def test_cosine_betas_golden():
    T = 100
    betas = np.asarray(dlib.make_betas(T, "squaredcos_cap_v2"))
    expected = np.array([min(1 - _alpha_bar((i + 1) / T) / _alpha_bar(i / T), 0.999)
                         for i in range(T)])
    np.testing.assert_allclose(betas, expected, rtol=1e-6)
    assert betas.shape == (T,)
    assert np.all(betas > 0) and np.all(betas <= 0.999)


def test_alphas_cumprod_matches_closed_form():
    T = 50
    sched = dlib.DiffusionSchedule.create(T)
    abar = np.asarray(sched.alphas_cumprod)
    # alphabar_t ≈ alpha_bar((t+1)/T) / alpha_bar(0) by telescoping (cap rarely binds early)
    closed = np.array([_alpha_bar((t + 1) / T) / _alpha_bar(0.0) for t in range(T)])
    np.testing.assert_allclose(abar[:40], closed[:40], rtol=1e-4)


def test_add_noise_formula():
    sched = dlib.DiffusionSchedule.create(10)
    x0 = jnp.ones((4, 3, 2))
    noise = 0.5 * jnp.ones((4, 3, 2))
    t = jnp.array([0, 3, 7, 9])
    out = sched.add_noise(x0, noise, t)
    abar = np.asarray(sched.alphas_cumprod)[np.asarray(t)]
    expected = (np.sqrt(abar) * 1.0 + np.sqrt(1 - abar) * 0.5)[:, None, None]
    np.testing.assert_allclose(np.asarray(out),
                               np.broadcast_to(expected, out.shape), rtol=1e-6)


def test_predict_x0_inverts_add_noise():
    sched = dlib.DiffusionSchedule.create(100, clip_sample=False)
    rng = jax.random.PRNGKey(1)
    x0 = jax.random.uniform(rng, (8, 5), minval=-0.9, maxval=0.9)
    noise = jax.random.normal(jax.random.PRNGKey(2), (8, 5))
    t = jnp.arange(8) * 12
    x_t = sched.add_noise(x0, noise, t)
    rec = sched.predict_x0(noise, x_t, t)  # oracle epsilon
    np.testing.assert_allclose(np.asarray(rec), np.asarray(x0), atol=1e-4)


def test_clip_sample():
    sched = dlib.DiffusionSchedule.create(100, clip_sample=True)
    x0 = sched.predict_x0(jnp.zeros((2, 3)), 5.0 * jnp.ones((2, 3)),
                          jnp.array([0, 0]))
    assert np.all(np.abs(np.asarray(x0)) <= 1.0 + 1e-6)


def test_ddpm_step_t0_is_deterministic_mean():
    sched = dlib.DiffusionSchedule.create(10, clip_sample=False)
    x_t = jnp.ones((2, 4))
    eps = 0.3 * jnp.ones((2, 4))
    t = jnp.array([0, 0])
    out1 = sched.ddpm_step(eps, x_t, t, jax.random.PRNGKey(0))
    out2 = sched.ddpm_step(eps, x_t, t, jax.random.PRNGKey(99))
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2))
    # at t=0: abar_prev=1 so x_prev should equal predicted x0
    x0 = sched.predict_x0(eps, x_t, t)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(x0), rtol=1e-5)


def test_ddpm_posterior_coefficients():
    sched = dlib.DiffusionSchedule.create(100, clip_sample=False)
    t = jnp.array([37])
    x_t = jnp.full((1, 2), 0.7)
    eps = jnp.full((1, 2), -0.2)
    out = sched.ddpm_step(eps, x_t, t, jax.random.PRNGKey(0))
    abar = np.asarray(sched.alphas_cumprod)
    beta = np.asarray(sched.betas)
    a = np.asarray(sched.alphas)
    ti = 37
    x0 = (0.7 - math.sqrt(1 - abar[ti]) * -0.2) / math.sqrt(abar[ti])
    mean = (math.sqrt(abar[ti - 1]) * beta[ti] / (1 - abar[ti]) * x0
            + math.sqrt(a[ti]) * (1 - abar[ti - 1]) / (1 - abar[ti]) * 0.7)
    var = beta[ti] * (1 - abar[ti - 1]) / (1 - abar[ti])
    noise = np.asarray(jax.random.normal(jax.random.PRNGKey(0), (1, 2)))
    np.testing.assert_allclose(np.asarray(out), mean + math.sqrt(var) * noise,
                               rtol=1e-4)


def test_ddim_deterministic_and_consistent():
    sched = dlib.DiffusionSchedule.create(100, clip_sample=False)
    x_t = jnp.ones((2, 4))
    eps = 0.1 * jnp.ones((2, 4))
    out = sched.ddim_step(eps, x_t, jnp.array([50, 50]), jnp.array([40, 40]))
    # closed form
    abar = np.asarray(sched.alphas_cumprod)
    x0 = (1.0 - math.sqrt(1 - abar[50]) * 0.1) / math.sqrt(abar[50])
    expected = (math.sqrt(abar[40]) * x0
                + math.sqrt(1 - abar[40]) * 0.1)
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-5)


def test_ddim_final_step_returns_x0():
    sched = dlib.DiffusionSchedule.create(100, clip_sample=False)
    x_t = 0.5 * jnp.ones((1, 3))
    eps = jnp.zeros((1, 3))
    out = sched.ddim_step(eps, x_t, jnp.array([9]), jnp.array([-1]))
    x0 = sched.predict_x0(eps, x_t, jnp.array([9]))
    np.testing.assert_allclose(np.asarray(out), np.asarray(x0), rtol=1e-5)


@pytest.mark.parametrize("sampler", ["ddpm", "ddim"])
def test_sampling_recovers_point_mass(sampler):
    """With an oracle epsilon-net for a delta distribution at mu, sampling
    should concentrate near mu."""
    T = 50
    sched = dlib.DiffusionSchedule.create(T, clip_sample=True)
    mu = jnp.array([0.4, -0.6, 0.2, 0.0])

    def denoise(x, t):
        abar = sched.alphas_cumprod[t][:, None]
        return (x - jnp.sqrt(abar) * mu) / jnp.sqrt(1 - abar)

    rng = jax.random.PRNGKey(3)
    if sampler == "ddpm":
        xs = dlib.sample_ddpm(sched, denoise, rng, (256, 4))
    else:
        xs = dlib.sample_ddim(sched, denoise, rng, (256, 4), num_inference_steps=10)
    err = np.abs(np.asarray(xs).mean(0) - np.asarray(mu))
    assert err.max() < 0.05, err


def test_sample_jit_compatible():
    T = 10
    sched = dlib.DiffusionSchedule.create(T)

    @jax.jit
    def run(rng):
        return dlib.sample_ddpm(sched, lambda x, t: x * 0.1, rng, (4, 3))

    out = run(jax.random.PRNGKey(0))
    assert out.shape == (4, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_velocity_target():
    sched = dlib.DiffusionSchedule.create(100, prediction_type="v_prediction",
                                          clip_sample=False)
    x0 = jnp.ones((2, 3)) * 0.5
    noise = jnp.ones((2, 3)) * -0.3
    t = jnp.array([10, 60])
    v = sched.velocity_target(x0, noise, t)
    x_t = sched.add_noise(x0, noise, t)
    rec = sched.predict_x0(v, x_t, t)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(x0), atol=1e-5)


def test_training_target_per_prediction_type():
    from latent_diffusion_planning_tpu.ops import diffusion as dlib
    import jax, jax.numpy as jnp
    rng = jax.random.PRNGKey(0)
    x0 = jax.random.normal(rng, (4, 6))
    noise = jax.random.normal(jax.random.PRNGKey(1), (4, 6))
    t = jnp.array([0, 3, 7, 9])
    for ptype, expect in [("epsilon", noise), ("sample", x0)]:
        s = dlib.DiffusionSchedule.create(10, prediction_type=ptype)
        assert jnp.allclose(s.training_target(x0, noise, t), expect)
    s = dlib.DiffusionSchedule.create(10, prediction_type="v_prediction")
    assert jnp.allclose(s.training_target(x0, noise, t),
                        s.velocity_target(x0, noise, t))


def test_sample_prediction_ddim_recovers_x0():
    """With a perfect x0-prediction denoiser, DDIM lands exactly on x0 —
    locks the sample-parameterized reverse path (predict_x0 + ddim_step)."""
    from latent_diffusion_planning_tpu.ops import diffusion as dlib
    import jax, jax.numpy as jnp, numpy as np
    sched = dlib.DiffusionSchedule.create(
        50, prediction_type="sample", clip_sample=True)
    x0_true = jnp.clip(
        jax.random.normal(jax.random.PRNGKey(2), (8, 12)) * 0.3, -1, 1)

    out = dlib.sample_ddim(sched, lambda x, t: x0_true,
                           jax.random.PRNGKey(3), (8, 12), 10)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x0_true),
                               atol=1e-5)
    out = dlib.sample_ddpm(sched, lambda x, t: x0_true,
                           jax.random.PRNGKey(4), (8, 12))
    np.testing.assert_allclose(np.asarray(out), np.asarray(x0_true),
                               atol=1e-4)
