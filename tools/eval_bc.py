#!/usr/bin/env python
"""Offline checkpoint sweep: reload every checkpoint of a run and evaluate.

Parity with the reference eval_bc.py: glob ``ckpt/*.ckpt`` of a finished run,
reload each, compute action-MSE stats on train+eval data and batched env
rollouts. The fragile hydra config "surgery" of the reference
(eval_bc.py:264-396) is unnecessary — each run stores its fully-resolved
config.yaml, which this driver reloads directly (overrides still apply).
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from latent_diffusion_planning_tpu.utils.runtime import setup as _setup_runtime
_setup_runtime()

import jax
import jax.numpy as jnp
import numpy as np
import yaml

from latent_diffusion_planning_tpu.rollout import engine
from latent_diffusion_planning_tpu.train.checkpoint import (
    Checkpointer, apply_params_snapshot)
from latent_diffusion_planning_tpu.utils.config import (_configify, instantiate,
                                                        load_config, merge,
                                                        parse_cli, resolve)
from latent_diffusion_planning_tpu.utils.logger import Logger


def main(argv=None) -> None:
    name, overrides = parse_cli(argv if argv is not None else sys.argv[1:])
    cfg = load_config(name or "eval_bc", overrides)

    run_dir = Path(cfg.run_dir)
    run_cfg = _configify(yaml.safe_load((run_dir / "config.yaml").read_text()))
    run_cfg = merge(run_cfg, {k: v for k, v in cfg.items()
                              if k not in ("run_dir", "_groups_")})
    resolve(run_cfg)

    data = instantiate(run_cfg.data)
    batch = next(data.train_dataloader())
    agent_cfg = dict(run_cfg.agent)
    agent_cfg.pop("vae_pretrain_path", None)
    if "obs_normalization" in agent_cfg:
        # stats_from_data: the facade recomputed measured bounds from the
        # same train file — mirror train/loop.py so eval normalizes alike
        agent_cfg["obs_normalization"] = data.meta["obs_normalization"]
    base_agent = instantiate(agent_cfg, jax.random.PRNGKey(0), batch,
                             data.shape_meta)

    logger = Logger(run_dir / "eval_sweep")
    ckpt = Checkpointer(run_dir / "ckpt")
    env = (instantiate(data.env_params["env"])
           if data.env_params.get("env") else None)
    meta = data.meta
    policy_keys = tuple(list(meta["lowdim_obs"]) + [
        (k[len("latent_"):] if k.startswith("latent_") else k)
        for k in meta["rgb_obs"] if k != "optimal"])

    # Optional separate IDM checkpoint (reference eval_bc.py:98-99:
    # cfg.idm_path overrides the swept checkpoints' IDM params) — lets a
    # planner sweep ride a fixed, separately-trained inverse-dynamics model.
    idm_snapshot = None
    if cfg.get("idm_snapshot_path"):
        idm_snapshot = ckpt.restore_raw(Path(cfg.idm_snapshot_path))

    # ckpt_steps=[60000] restricts the sweep (knob sweeps re-evaluate one
    # trained checkpoint under many eval-time configs — re-scoring every
    # checkpoint each time would multiply the cost by the save cadence)
    only_steps = {int(s) for s in cfg.get("ckpt_steps", [])} or None

    rng = jax.random.PRNGKey(cfg.get("seed", 1111111))
    train_iter = data.train_dataloader()
    eval_iter = data.eval_dataloader()
    steps_paths = []
    for path in ckpt.list_checkpoints():
        step = int(path.name.split(".")[0])
        if only_steps is None or step in only_steps:
            steps_paths.append((step, path))

    def load(path):
        agent = apply_params_snapshot(base_agent, ckpt.restore_raw(path))
        if idm_snapshot is not None:
            agent = apply_params_snapshot(agent, idm_snapshot,
                                          restore_keys=["idm_params"])
        return agent

    rollout_kw = dict(
        obs_horizon=run_cfg.obs_horizon,
        action_horizon=(int(cfg.get("eval_action_horizon", 0))
                        or run_cfg.action_horizon),
        plan_blend=float(cfg.get("plan_blend", 0.0)),
        policy_obs_keys=policy_keys,
        add_optimal="optimal" in meta["lowdim_obs"])
    do_rollouts = env is not None and cfg.get("n_eval_episodes", 0) > 0
    # the rollout rng is fold_in(seed_key, ckpt_step): a function of
    # (seed, step) only — diagnosis harnesses (tools/diag_aloha.py) can
    # replay the protocol's exact episodes without re-running the sweep
    # (the old sequential-split stream depended on sweep order)
    seed_key = jax.random.PRNGKey(cfg.get("seed", 1111111))

    # sweep_batch=K fuses K checkpoints' rollouts into one vmapped device
    # program — at protocol size (50 episodes) per-ckpt calls leave the chip
    # <1% utilized (VERDICT r4 weak 7); K×50 episodes in one call restores
    # the batch the hardware wants. 0/1 keeps the sequential path.
    group = max(1, int(cfg.get("sweep_batch", 0)))
    for i in range(0, len(steps_paths), group):
        chunk = [(s, load(p)) for s, p in steps_paths[i:i + group]]
        for step, agent in chunk:
            for split, it in (("train", train_iter), ("eval", eval_iter)):
                b = next(it)
                rng, sub = jax.random.split(rng)
                pred = agent.sample_action(b, sub)
                gt = jnp.asarray(b["actions"])[:, : pred.shape[1]]
                logger.log_metrics(
                    {f"{split}_action_mse": float(jnp.mean((pred - gt) ** 2)),
                     f"{split}_action_l1": float(jnp.mean(jnp.abs(pred - gt)))},
                    step, "eval")
        if not do_rollouts:
            for step, _ in chunk:
                logger.dump(step, "eval")
            continue
        outs = None
        if len(chunk) > 1:
            try:
                outs = engine.run_batched_eval_multi(
                    env, [a for _, a in chunk], cfg.n_eval_episodes,
                    [jax.random.fold_in(seed_key, s) for s, _ in chunk],
                    **rollout_kw)
            except Exception as e:  # noqa: BLE001 — fused sweep is best-effort
                print(f"[eval_bc] fused {len(chunk)}-ckpt sweep failed "
                      f"({e!r}); falling back to per-checkpoint rollouts")
        if outs is None:
            outs = [engine.run_batched_eval(
                env, a, cfg.n_eval_episodes, jax.random.fold_in(seed_key, s),
                **rollout_kw) for s, a in chunk]
        for (step, _), out in zip(chunk, outs):
            logger.log_metrics(out["metrics"], step, "eval")
            print(f"ckpt {step}: success={out['metrics']['success']:.2%} "
                  f"reward={out['metrics']['reward']:.2f}")
            logger.dump(step, "eval")


if __name__ == "__main__":
    main()
