#!/usr/bin/env python
"""Scripted expert demo collection on device envs.

Parity with the reference's scripted demo generation
(collect_aloha_scripted_demos.py): roll the env's built-in waypoint expert,
keep successful episodes, write a robomimic-format HDF5. Runs thousands of
episodes per minute because expert + physics + rendering are one jitted scan.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from latent_diffusion_planning_tpu.utils.runtime import setup as _setup_runtime
_setup_runtime()

import jax

from latent_diffusion_planning_tpu.data.writer import write_trajectories
from latent_diffusion_planning_tpu.rollout import engine
from latent_diffusion_planning_tpu.utils.config import (instantiate,
                                                        load_config, parse_cli)


def main(argv=None) -> None:
    name, overrides = parse_cli(argv if argv is not None else sys.argv[1:])
    cfg = load_config(name or "collect_demos", overrides)

    env = instantiate(cfg.env)
    rng = jax.random.PRNGKey(cfg.get("seed", 0))
    out = engine.run_scripted_collection(
        env, cfg.n_episodes, rng, episode_len=cfg.get("episode_len"),
        noise=cfg.get("noise", 0.0), noise_hold=cfg.get("noise_hold", 1),
        clean_labels=cfg.get("clean_labels", False))
    env_kwargs = {k: v for k, v in cfg.env.items() if k != "_target_"}
    if cfg.get("episode_len"):
        # the rollout override is the TRUE episode length of these demos —
        # record it, or downstream eval envs rebuilt from env_args inherit
        # a shorter cap than the demos they were trained on
        env_kwargs["episode_len"] = int(cfg.episode_len)
    n = write_trajectories(
        cfg.out_path, out,
        env_meta={"env_name": type(env).__name__, "env_kwargs": env_kwargs},
        successful_only=cfg.get("successful_only", True),
        max_demos=cfg.get("max_demos"),
        trim_success_margin=cfg.get("trim_success_margin"))
    import numpy as np
    sr = float(np.asarray(out["success"]).any(axis=1).mean())
    print(f"wrote {n} demos to {cfg.out_path} (expert success {sr:.1%})")


if __name__ == "__main__":
    main()
