#!/usr/bin/env python
"""Suboptimal rollout data collection from a trained policy checkpoint.

Parity with the reference collect_data.py + run_robomimic_data_collection
(utils/rm_env_utils.py:223-333): load a checkpoint, roll the policy with
optional Gaussian action noise, filter (un)successful episodes, write a
robomimic-format HDF5 for mixed training. The reloaded run's saved config is
self-contained (config.yaml next to the checkpoint) — no hydra surgery.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from latent_diffusion_planning_tpu.utils.runtime import setup as _setup_runtime
_setup_runtime()

import jax
import numpy as np

from latent_diffusion_planning_tpu.data.writer import write_trajectories
from latent_diffusion_planning_tpu.rollout import engine
from latent_diffusion_planning_tpu.train.checkpoint import (
    Checkpointer, apply_params_snapshot)
from latent_diffusion_planning_tpu.utils.config import (Config, instantiate,
                                                        load_config, parse_cli)
import yaml


def load_agent_from_run(run_dir: Path, ckpt_name: str | None = None):
    """Rebuild the agent of a finished run and load a checkpoint into it."""
    run_cfg = Config(yaml.safe_load((run_dir / "config.yaml").read_text()))
    from latent_diffusion_planning_tpu.utils.config import _configify
    run_cfg = _configify(run_cfg)

    data = instantiate(run_cfg.data)
    batch = next(data.train_dataloader())
    agent_cfg = dict(run_cfg.agent)
    agent_cfg.pop("vae_pretrain_path", None)
    if "obs_normalization" in agent_cfg:
        # normalize exactly as training did: Workspace.init_agent swaps the
        # config's hand-written bounds for the data facade's measured stats
        # (and newer runs persist them back into config.yaml) — rebuilding
        # with stale bounds silently yields a garbage policy
        agent_cfg["obs_normalization"] = data.meta["obs_normalization"]
    agent = instantiate(agent_cfg, jax.random.PRNGKey(0), batch,
                        data.shape_meta)

    ckpt = Checkpointer(run_dir / "ckpt")
    paths = ckpt.list_checkpoints()
    assert paths, f"no checkpoints under {run_dir}/ckpt"
    path = (run_dir / "ckpt" / ckpt_name) if ckpt_name else paths[-1]
    agent = apply_params_snapshot(agent, ckpt.restore_raw(path))
    return agent, run_cfg, data


def main(argv=None) -> None:
    name, overrides = parse_cli(argv if argv is not None else sys.argv[1:])
    cfg = load_config(name or "collect_data", overrides)

    run_dir = Path(cfg.run_dir)
    agent, run_cfg, data = load_agent_from_run(run_dir, cfg.get("ckpt_name"))

    env = instantiate(data.env_params["env"])
    meta = data.meta
    keys = list(meta["lowdim_obs"]) + [
        (k[len("latent_"):] if k.startswith("latent_") else k)
        for k in meta["rgb_obs"]]

    rng = jax.random.PRNGKey(cfg.get("seed", 0))
    out = engine.run_data_collection(
        env, agent, cfg.n_episodes, rng,
        obs_horizon=run_cfg.obs_horizon,
        action_horizon=run_cfg.action_horizon,
        episode_len=cfg.get("episode_len"),
        action_noise=cfg.get("noise", 0.0),
        policy_obs_keys=tuple(k for k in keys if k != "optimal"),
        add_optimal="optimal" in keys)

    n = write_trajectories(
        cfg.out_path, out,
        env_meta={"env_name": type(env).__name__},
        successful_only=cfg.get("successful_only", False),
        unsuccessful_only=cfg.get("unsuccessful_only", False),
        max_demos=cfg.get("max_demos"))
    sr = float(np.asarray(out["success"]).any(axis=1).mean())
    print(f"wrote {n} rollouts to {cfg.out_path} (policy success {sr:.1%}, "
          f"noise {cfg.get('noise', 0.0)})")


if __name__ == "__main__":
    main()
