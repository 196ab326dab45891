"""Golden-render regression: fixed scenes render bit-near what was recorded,
in pixels and in committed-VAE latent space.

Complements tests/test_replay_regression.py (state fidelity) with *visual*
fidelity: silhouette, lighting, or camera drift that leaves dynamics intact
would silently shift the latent distribution every trained policy consumes
(the reference has the same coupling through its frozen Stable-VAE encodings,
process_sdvae_data.py). Both XLA and Pallas(interpret) backends are checked
against the same fixture. Re-record with tests/fixtures/record_render.py
after an intentional renderer change.
"""

from pathlib import Path

import jax
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # compile-heavy: run with -m "not slow" for the fast tier

FIXTURE = Path(__file__).parent / "fixtures" / "render_golden.npz"
BENCH = Path(__file__).parents[1] / "assets" / "bench"


@pytest.fixture(scope="module")
def golden():
    return np.load(FIXTURE)


def _roll_frames(env, key, act_steps, grab, obs_key):
    state, obs = env.reset(key)
    step = jax.jit(env.step)
    act = jax.jit(env.scripted_action)
    frames = [np.asarray(obs[obs_key])]
    for t in range(act_steps):
        state, obs, _, _ = step(state, act(state))
        if t in grab:
            frames.append(np.asarray(obs[obs_key]))
    return np.stack(frames)


def test_lift_renders_match(golden):
    from latent_diffusion_planning_tpu.envs.lift_physics import LiftPhysicsEnv

    env = LiftPhysicsEnv(image_size=64, render_images=True, episode_len=40)
    frames = _roll_frames(env, jax.random.PRNGKey(3), 20, (4, 9, 19),
                          "agentview_image")
    ref = golden["lift_frames"].astype(np.float32)
    diff = np.abs(frames.astype(np.float32) - ref)
    assert diff.mean() < 1.0 and diff.max() < 64.0, (
        f"lift render drift: mean {diff.mean():.2f}, max {diff.max():.0f}")


def test_aloha_renders_match(golden):
    from latent_diffusion_planning_tpu.envs.aloha_cube import (
        AlohaTransferCubeEnv)

    env = AlohaTransferCubeEnv(image_size=64, render_images=True,
                               episode_len=50)
    frames = _roll_frames(env, jax.random.PRNGKey(7), 30, (9, 19, 29),
                          "wrist64_image")
    ref = golden["aloha_frames"].astype(np.float32)
    diff = np.abs(frames.astype(np.float32) - ref)
    assert diff.mean() < 1.0 and diff.max() < 64.0, (
        f"aloha render drift: mean {diff.mean():.2f}, max {diff.max():.0f}")


def test_pallas_backend_latents_match(golden):
    """Pallas(interpret) renders of the lift scene embed to the same committed-
    VAE latents as the recorded XLA renders — the latent-space bound policies
    actually feel (a few pixels of ray-cast epsilon must stay sub-threshold
    after encoding)."""
    from latent_diffusion_planning_tpu.envs.lift_physics import LiftPhysicsEnv
    from tests.fixtures.record_render import encode_with_bench_vae

    env = LiftPhysicsEnv(image_size=64, render_images=True, episode_len=40,
                         renderer="pallas")
    frames = _roll_frames(env, jax.random.PRNGKey(3), 20, (4, 9, 19),
                          "agentview_image")
    lat = encode_with_bench_vae(frames)
    ref = golden["lift_latents"]
    rms = float(np.sqrt(np.mean((lat - ref) ** 2)))
    scale = float(np.sqrt(np.mean(ref ** 2)))
    assert rms < 0.05 * max(scale, 1.0), (
        f"latent drift rms {rms:.4f} vs signal rms {scale:.4f}")
