"""Training workspace: the shared engine behind train_bc / train_mixed_bc /
train_vae drivers.

Capability parity with the reference Workspaces (train_bc.py:24-240,
train_mixed_bc.py:24-262, train_vae.py): instantiate data + agent from
config, shard batches over the dp mesh, jitted update per step, periodic
log / offline-eval (action MSE vs demos) / env rollout / checkpoint.

TPU-first: batches are already device-resident (data layer), params are
explicitly replicated over the mesh, eval rollouts run on the fused device
engine (rollout/engine.py) instead of worker processes.
"""

from __future__ import annotations

import time
from pathlib import Path
from typing import Any, Iterator

import jax
import jax.numpy as jnp
import numpy as np

from ..parallel import mesh as meshlib
from ..rollout import engine as rollout_engine
from ..utils import media
from ..utils.config import Config, instantiate, save_config
from ..utils.logger import Logger
from ..utils.timers import Every, Timer
from .checkpoint import Checkpointer, apply_params_snapshot


def _plain(obj: Any) -> Any:
    """Stats pytree → yaml-serializable (arrays to lists, scalars native)."""
    if isinstance(obj, dict):
        return {k: _plain(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_plain(v) for v in obj]
    if isinstance(obj, (np.ndarray, jnp.ndarray)):
        return np.asarray(obj).tolist()
    if isinstance(obj, (np.floating, np.integer)):
        return obj.item()
    return obj


class Workspace:
    def __init__(self, cfg: Config, work_dir: str | Path | None = None):
        self.cfg = cfg
        self.work_dir = Path(work_dir or cfg.get("work_dir", "experiments/run"))
        self.work_dir.mkdir(parents=True, exist_ok=True)
        save_config(cfg, self.work_dir / "config.yaml")

        self.logger = Logger(self.work_dir, use_tb=cfg.get("use_tb", False))
        self.ckpt = Checkpointer(self.work_dir / "ckpt")
        self.timer = Timer()
        self.rng = jax.random.PRNGKey(cfg.get("seed", 0))

        self.data = instantiate(cfg.data)
        self.mixed_data = (instantiate(cfg.mixed_data)
                           if "mixed_data" in cfg else None)
        self.mesh = meshlib.make_mesh()
        self.agent: Any = None
        self.step = 0
        self._env = None

    # ------------------------------------------------------------------
    def init_agent(self, init_batch: dict) -> None:
        self.rng, rng = jax.random.split(self.rng)
        agent_cfg = dict(self.cfg.agent)
        vae_snapshot_path = agent_cfg.pop("vae_pretrain_path", None)
        if "obs_normalization" in agent_cfg:
            # re-read from the live data facade: ``stats_from_data`` replaces
            # the config's hand-written bounds with measured ones after the
            # yaml interpolation already resolved (data/datasets.py)
            agent_cfg["obs_normalization"] = self.data.meta[
                "obs_normalization"]
            # persist the EFFECTIVE bounds: anything that rebuilds this agent
            # from the run dir (collect_data.py, bench.py, relaunch) must
            # normalize exactly as training did — stale hand-written bounds
            # in the saved config silently produce a garbage policy
            self.cfg["agent"]["obs_normalization"] = _plain(
                self.data.meta["obs_normalization"])
            save_config(self.cfg, self.work_dir / "config.yaml")
        self.agent = instantiate(
            agent_cfg, rng, init_batch, self.data.shape_meta)
        if vae_snapshot_path:
            snap = self.ckpt.restore_raw(vae_snapshot_path)
            vp = snap.get("vae_ema_params") or snap.get("vae_params")
            if vp is not None and hasattr(self.agent, "vae_params"):
                self.agent = self.agent.replace(vae_params=vp)
        if self.cfg.get("snapshot_path"):
            snap = self.ckpt.restore_raw(self.cfg.snapshot_path)
            self.agent = apply_params_snapshot(
                self.agent, snap, self.cfg.get("restore_keys"))
        if self.cfg.get("resume"):
            # bit-exact continuation from the newest <step>.state in this
            # run's ckpt dir (the reference's hydra run-dir restore analogue,
            # train_bc.py snapshot reload) — params, optimizer and EMA state
            # all resume; the step counter picks up where training stopped.
            states = self.ckpt.list_states()
            if states:
                latest = states[-1]
                self.agent = self.ckpt.restore_state(latest, self.agent)
                self.step = int(latest.name.split(".")[0])
                self.logger.note(f"resumed full state @ {self.step} "
                                 f"({latest.name})")
        self.agent = meshlib.replicate(self.agent, self.mesh)
        n_params = sum(x.size for x in jax.tree_util.tree_leaves(
            self.agent.get_params()))
        self.logger.note(f"agent created: {n_params:.3e} trainable params, "
                         f"mesh {dict(self.mesh.shape)}")

    # ------------------------------------------------------------------
    def run(self) -> None:
        cfg = self.cfg
        train_iter = self.data.train_dataloader()
        mixed_iter = (self.mixed_data.train_dataloader()
                      if self.mixed_data is not None else None)

        batch = next(train_iter)
        if self.agent is None:
            self.init_agent(batch)

        log_every = Every(cfg.get("log_every", 100))
        eval_every = Every(cfg.get("eval_every", 10_000))
        save_every = Every(cfg.get("save_every", 50_000))
        n_steps = cfg.n_grad_steps

        self.logger.note(f"training for {n_steps} steps")
        t_last = time.perf_counter()
        while self.step < n_steps:
            with self.timer.section("update"):
                self.rng, rng = jax.random.split(self.rng)
                if mixed_iter is not None:
                    mixed_batch = next(mixed_iter)
                    self.agent, metrics = self.agent.update_mixed(
                        batch, mixed_batch, rng, self.step)
                else:
                    self.agent, metrics = self.agent.update(
                        batch, rng, self.step)
            with self.timer.section("data"):
                batch = next(train_iter)

            if log_every(self.step):
                jax.block_until_ready(metrics)
                now = time.perf_counter()
                sps = (cfg.get("log_every", 100) / (now - t_last)
                       if self.step else 0.0)
                t_last = now
                self.logger.log_metrics(metrics, self.step, "train")
                self.logger.log_metrics(self.timer.averages(), self.step,
                                        "train")
                self.logger.log_metrics({"steps_per_sec": sps}, self.step,
                                        "train")
                self.logger.dump(self.step, "train")
            if save_every(self.step) and self.step > 0:
                self.save_snapshot()
            if eval_every(self.step) and self.step > 0:
                self.eval()
            self.step += 1

        self.save_snapshot()
        self.eval()

    # ------------------------------------------------------------------
    def eval(self) -> None:
        """Offline action-MSE + batched env rollout (parity train_bc.py:
        132-201)."""
        cfg = self.cfg
        self.rng, rng = jax.random.split(self.rng)

        # offline: action MSE/L1 vs ground-truth windows
        eval_iter = self.data.eval_dataloader()
        for split, it in (("train", self.data.train_dataloader()),
                          ("eval", eval_iter)):
            batch = next(it)
            rng, sub = jax.random.split(rng)
            try:
                pred = self.agent.sample_action(batch, sub)
                # compare the overlapping prefix: the hierarchical agent
                # decodes pred_horizon*idm_horizon actions, longer than the
                # data window (horizon) — the tail has no ground truth
                n = min(pred.shape[1], batch["actions"].shape[1])
                pred = pred[:, :n]
                gt = jnp.asarray(batch["actions"])[:, :n]
                mse = float(jnp.mean((pred - gt) ** 2))
                l1 = float(jnp.mean(jnp.abs(pred - gt)))
                self.logger.log_metrics(
                    {f"{split}_action_mse": mse, f"{split}_action_l1": l1},
                    self.step, "eval")
            except (AttributeError, NotImplementedError):
                pass
            rng, sub = jax.random.split(rng)
            metrics = self.agent.get_metrics(batch, sub)
            if hasattr(self.agent, "sample_plan_stats"):
                # plan-level health (reference train_mixed_bc.py:161): a
                # plan_mse >> plan_target_var flags a non-contracting
                # planner long before closed-loop eval would
                rng, sub = jax.random.split(rng)
                metrics.update(self.agent.sample_plan_stats(batch, sub))
            self.logger.log_metrics(
                {f"{split}_{k}": v for k, v in metrics.items()},
                self.step, "eval")

        # env rollout on the fused device engine
        if cfg.get("n_eval_episodes", 0) > 0 and self._make_env() is not None:
            rng, sub = jax.random.split(rng)
            t0 = time.perf_counter()
            out = rollout_engine.run_batched_eval(
                self._env, self.agent, cfg.n_eval_episodes, sub,
                obs_horizon=cfg.obs_horizon,
                action_horizon=cfg.action_horizon,
                policy_obs_keys=self._policy_obs_keys(),
                add_optimal="optimal" in self._policy_obs_keys(),
                video_envs=min(2, cfg.n_eval_episodes))
            wall = time.perf_counter() - t0
            m = dict(out["metrics"])
            m["total_time"] = wall
            m["env_steps_per_sec"] = (m["horizon"] * m["n_episodes"]) / wall
            self.logger.log_metrics(m, self.step, "eval")
            if "videos" in out:
                vid_dir = self.work_dir / "video"
                for i, v in enumerate(out["videos"]):
                    media.save_video(vid_dir / f"{self.step}_{i}.mp4", v)
        self.logger.dump(self.step, "eval")

    def _policy_obs_keys(self) -> tuple[str, ...]:
        meta = self.data.meta
        keys = list(meta["lowdim_obs"])
        for k in meta["rgb_obs"]:
            # latent keys are encoded from their raw camera stream at eval
            keys.append(k[len("latent_"):] if k.startswith("latent_") else k)
        return tuple(keys)

    def _make_env(self):
        """Eval env: the dataset's recorded env_meta wins when present
        (parity: reference train_bc.py:170-176 rebuilds the env from the
        HDF5's env_args); the config's env_params.env is the fallback.

        The config's eval ``episode_len`` overrides the recorded one: the
        reference evals with its own horizon (eval_bc.yaml / SIM_TASK_CONFIGS
        400) regardless of the collection env's cap, and a recorded cap can
        understate the task's needed time (a transfer-cube demo succeeds at
        ~70 steps — an 80-step eval leaves a learned policy no slack, a
        round-3 silent eval-protocol bug)."""
        if self._env is None:
            ep = self.data.env_params.get("env", {}) or {}
            overrides = {}
            # env_params.env may be a config dict or an already-instantiated
            # env (facades eagerly instantiate non-deferred targets)
            eval_len = (ep.get("episode_len")
                        if hasattr(ep, "get")
                        else getattr(ep, "episode_len", None))
            if eval_len is None:
                eval_len = self.data.env_params.get("episode_len")
            if eval_len:
                overrides["episode_len"] = int(eval_len)
            env_meta = getattr(self.data, "env_meta", None)
            if env_meta and env_meta.get("env_name"):
                try:
                    from ..envs.from_meta import make_env_from_meta
                    self._env = make_env_from_meta(env_meta, **overrides)
                    self.logger.note(
                        f"eval env from dataset env_meta: "
                        f"{env_meta['env_name']} "
                        f"(episode_len {self._env.episode_len})")
                except KeyError:
                    pass
            if self._env is None and self.data.env_params.get("env"):
                self._env = instantiate(self.data.env_params["env"])
        return self._env

    # ------------------------------------------------------------------
    def save_snapshot(self) -> None:
        with self.timer.section("save"):
            self.ckpt.save_params(self.step, self.agent.get_params())
            if self.cfg.get("save_full_state", True):
                self.ckpt.save_state(self.step, self.agent,
                                     config=self.cfg.to_dict())
        self.logger.note(f"saved snapshot @ {self.step}")

    def load_snapshot(self, path: str | Path) -> None:
        snap = self.ckpt.restore_raw(path)
        self.agent = apply_params_snapshot(self.agent, snap)
