#!/usr/bin/env python
"""(Re-)record render_golden.npz: fixed-scene renders + committed-VAE latents.

The render-validation analogue of record_replay.py (SURVEY §7 hard part 2):
replay tests lock *state* trajectories; this locks the *pixel* surface and
its latent embedding through the committed bench VAE, so silhouette /
lighting / camera drift that leaves dynamics untouched still fails CI
(reference contrast: robosuite/MuJoCo offscreen renders feed a frozen
Stable-VAE — process_sdvae_data.py — so render drift silently corrupts
latents there too; here it is a guarded invariant).

Run after an *intentional* renderer or scene-geometry change.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import jax
import numpy as np

# record on the platform the tests replay on (see record_replay.py)
jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", jax.default_backend()

OUT = Path(__file__).parent / "render_golden.npz"
BENCH = Path(__file__).parents[2] / "assets" / "bench"


def lift_frames() -> np.ndarray:
    from latent_diffusion_planning_tpu.envs.lift_physics import LiftPhysicsEnv

    env = LiftPhysicsEnv(image_size=64, render_images=True, episode_len=40)
    state, obs = env.reset(jax.random.PRNGKey(3))
    step = jax.jit(env.step)
    act = jax.jit(env.scripted_action)
    frames = [np.asarray(obs["agentview_image"])]
    for t in range(20):
        state, obs, _, _ = step(state, act(state))
        if t in (4, 9, 19):
            frames.append(np.asarray(obs["agentview_image"]))
    return np.stack(frames)


def aloha_frames() -> np.ndarray:
    from latent_diffusion_planning_tpu.envs.aloha_cube import (
        AlohaTransferCubeEnv)

    env = AlohaTransferCubeEnv(image_size=64, render_images=True,
                               episode_len=50)
    state, obs = env.reset(jax.random.PRNGKey(7))
    step = jax.jit(env.step)
    act = jax.jit(env.scripted_action)
    frames = [np.asarray(obs["wrist64_image"])]
    for t in range(30):
        state, obs, _, _ = step(state, act(state))
        if t in (9, 19, 29):
            frames.append(np.asarray(obs["wrist64_image"]))
    return np.stack(frames)


def encode_with_bench_vae(frames: np.ndarray) -> np.ndarray:
    """Mode latents of uint8 NHWC frames through the committed bench VAE."""
    import yaml

    from latent_diffusion_planning_tpu.models.vae import KLVAE
    from latent_diffusion_planning_tpu.train.checkpoint import Checkpointer

    cfg = yaml.safe_load((BENCH / "config.yaml").read_text())["model_vae"]
    cfg.pop("_target_", None)
    vae = KLVAE(**{k: (tuple(v) if isinstance(v, list) else v)
                   for k, v in cfg.items()})
    snap = Checkpointer(BENCH).restore_raw(BENCH / "agent.ckpt")
    params = snap.get("vae_ema_params") or snap["vae_params"]
    x = frames.astype(np.float32) / 127.5 - 1.0
    mean, _ = vae.apply({"params": params}, jax.numpy.asarray(x),
                        method=KLVAE.encode)
    return np.asarray(mean, np.float32)


def main() -> None:
    lift = lift_frames()
    aloha = aloha_frames()
    lat = encode_with_bench_vae(lift)
    np.savez(OUT, lift_frames=lift.astype(np.uint8),
             aloha_frames=aloha.astype(np.uint8), lift_latents=lat)
    print(f"wrote {OUT}: lift {lift.shape}, aloha {aloha.shape}, "
          f"latents {lat.shape}")


if __name__ == "__main__":
    main()
