#!/usr/bin/env python
"""(Re-)record replay_golden.npz sections from the current dynamics.

Usage: python tests/fixtures/record_replay.py [aloha] [lift]

Run after an *intentional* dynamics change (servo gains, contact params,
chain geometry) to re-baseline the named sections; unnamed sections are
preserved from the existing fixture so an ALOHA re-record cannot silently
reset the Lift baseline. The replay tests then guard the new dynamics.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import jax
import numpy as np

# Record on the SAME platform the tests replay on: the axon sitecustomize
# force-selects the tunneled TPU regardless of JAX_PLATFORMS, and TPU-vs-CPU
# drift over 50 contact steps (~4e-5) exceeds the replay tolerance.
jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", jax.default_backend()

OUT = Path(__file__).parent / "replay_golden.npz"


def record_aloha() -> dict:
    from latent_diffusion_planning_tpu.envs.aloha_cube import (
        AlohaTransferCubeEnv)

    env = AlohaTransferCubeEnv(render_images=False, episode_len=50)
    state, _ = env.reset(jax.random.PRNGKey(11))
    step = jax.jit(env.step)
    act_fn = jax.jit(env.scripted_action)
    actions, qpos, cube, rewards = [], [], [], []
    for _ in range(50):
        a = act_fn(state)
        actions.append(np.asarray(a))
        state, obs, r, _ = step(state, a)
        qpos.append(np.asarray(obs["qpos"]))
        cube.append(np.asarray(state.cube_pos))
        rewards.append(float(r))
    return {"aloha_actions": np.stack(actions), "aloha_qpos": np.stack(qpos),
            "aloha_cube": np.stack(cube),
            "aloha_rewards": np.asarray(rewards)}


def record_lift() -> dict:
    from latent_diffusion_planning_tpu.envs.lift_physics import LiftPhysicsEnv

    env = LiftPhysicsEnv(render_images=False, episode_len=40)
    state, _ = env.reset(jax.random.PRNGKey(5))
    step = jax.jit(env.step)
    act_fn = jax.jit(env.scripted_action)
    actions, eef, cube, rewards = [], [], [], []
    for _ in range(40):
        a = act_fn(state)
        actions.append(np.asarray(a))
        state, obs, r, _ = step(state, a)
        eef.append(np.asarray(obs["robot0_eef_pos"]))
        cube.append(np.asarray(state.bodies.pos[0]))
        rewards.append(float(r))
    return {"lift_actions": np.stack(actions), "lift_eef": np.stack(eef),
            "lift_cube": np.stack(cube), "lift_rewards": np.asarray(rewards)}


def main() -> None:
    sections = set(sys.argv[1:]) or {"aloha", "lift"}
    data = dict(np.load(OUT)) if OUT.exists() else {}
    if "aloha" in sections:
        data.update(record_aloha())
    if "lift" in sections:
        data.update(record_lift())
    np.savez(OUT, **data)
    print(f"wrote {OUT} with keys {sorted(data)}")


if __name__ == "__main__":
    main()
