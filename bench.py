#!/usr/bin/env python
"""Headline benchmark: fused plan→act→step rollout throughput on one chip.

Measures env-steps/sec of the complete eval pipeline — batched device-resident
Lift envs (physics + 64×64 analytic rendering) driven by a full-size LDP
policy (VAE encode → DDIM latent planning → IDM action decode) — under one
jitted lax.scan, the engine that replaces the reference's multiprocessing
MuJoCo eval fabric (utils/rm_env_utils.py).

vs_baseline compares against the BASELINE.json north-star target of
100k env-steps/sec/chip (the reference publishes no throughput numbers;
its CPU-MuJoCo eval fabric runs ~1k env-steps/sec with 5 workers).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import jax
import jax.numpy as jnp
import numpy as np

NORTH_STAR = 100_000.0  # env-steps/sec/chip (BASELINE.md north-star)
# inference dtype: bfloat16 is the TPU serving dtype (fp32 params, bf16
# compute); override with BENCH_DTYPE=float32
BENCH_DTYPE = os.environ.get("BENCH_DTYPE", "bfloat16")


def build(n_envs: int, episode_len: int, image_size: int = 64):
    from latent_diffusion_planning_tpu.envs.lift import (LIFT_OBS_STATS,
                                                         LIFT_SHAPE_META,
                                                         LiftEnv)
    from latent_diffusion_planning_tpu.models.agents import LDPAgent

    env = LiftEnv(image_size=image_size, render_images=True,
                  episode_len=episode_len, renderer="pallas")

    B, H = 4, 9
    rng = np.random.default_rng(0)
    batch = {
        "obs": {
            "robot0_eef_pos": jnp.asarray(rng.normal(size=(B, H, 3)) * 0.1
                                          + np.array([0, 0, 1.0]), jnp.float32),
            "robot0_eef_quat": jnp.tile(jnp.asarray([1.0, 0, 0, 0]), (B, H, 1)),
            "robot0_gripper_qpos": jnp.zeros((B, H, 2)),
            "latent_agentview_image": jnp.asarray(
                rng.normal(size=(B, H, 16)), jnp.float32),
        },
        "actions": jnp.asarray(np.clip(rng.normal(size=(B, H, 7)), -1, 1),
                               jnp.float32),
    }
    # flagship-size LDP: reference U-Net dims (256,512,1024), IDM MLP 256,
    # full 6-stage VAE; DDIM 10-step inference (the fast-eval feature).
    agent = LDPAgent.create(
        jax.random.PRNGKey(0), batch, LIFT_SHAPE_META,
        planner={"_target_": ("latent_diffusion_planning_tpu.models.nets."
                              "unet1d.ConditionalUnet1D"),
                 "down_dims": [256, 512, 1024], "kernel_size": 5,
                 "n_groups": 8, "compute_dtype": BENCH_DTYPE},
        idm_net={"_target_": ("latent_diffusion_planning_tpu.models.nets."
                              "mlp.MLPDiffusion"),
                 "n_blocks": 3, "hidden_dim": 256, "time_dim": 64,
                 "compute_dtype": BENCH_DTYPE},
        vae={"block_out_channels": [128, 256, 256, 256, 256, 256],
             "norm_groups": 32, "compute_dtype": BENCH_DTYPE},
        vae_feature_dim=16,
        lowdim_obs=["robot0_eef_pos", "robot0_eef_quat",
                    "robot0_gripper_qpos"],
        rgb_obs=["latent_agentview_image"],
        obs_normalization=LIFT_OBS_STATS,
        obs_horizon=1, pred_horizon=8, action_horizon=4,
        planner_n_diffusion_steps=100, idm_n_diffusion_steps=100,
        planner_inference_steps=10, idm_inference_steps=10,
        warmup_steps=10, decay_steps=100)
    return env, agent


def measure(n_envs: int, episode_len: int) -> tuple[float, dict]:
    from latent_diffusion_planning_tpu.rollout import engine

    env, agent = build(n_envs, episode_len)
    keys = ("robot0_eef_pos", "robot0_eef_quat", "robot0_gripper_qpos",
            "agentview_image")

    def run(seed):
        return engine.run_batched_eval(
            env, agent, n_envs, jax.random.PRNGKey(seed), obs_horizon=1,
            action_horizon=4, episode_len=episode_len, policy_obs_keys=keys)

    t0 = time.perf_counter()
    run(0)  # compile + warmup
    compile_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    out = run(1)
    wall = time.perf_counter() - t0
    total_steps = float(np.asarray(out["per_episode"]["horizon"]).sum())
    return total_steps / wall, {"compile_s": round(compile_s, 1),
                                "wall_s": round(wall, 2),
                                "env_steps": int(total_steps),
                                "success": out["metrics"]["success"]}


def main() -> None:
    for n_envs, episode_len in ((1024, 400), (256, 200), (64, 100)):
        try:
            sps, info = measure(n_envs, episode_len)
            print(json.dumps({
                "metric": f"fused_rollout_env_steps_per_sec_{n_envs}envs",
                "value": round(sps, 1),
                "unit": "env-steps/sec/chip",
                "vs_baseline": round(sps / NORTH_STAR, 3),
                **info,
            }))
            return
        except Exception as e:  # noqa: BLE001 — fall back to smaller shape
            print(f"# bench config ({n_envs} envs) failed: {e!r}",
                  file=sys.stderr)
    print(json.dumps({"metric": "fused_rollout_env_steps_per_sec",
                      "value": 0.0, "unit": "env-steps/sec/chip",
                      "vs_baseline": 0.0}))


if __name__ == "__main__":
    main()
