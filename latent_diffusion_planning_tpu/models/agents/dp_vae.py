"""Diffusion Policy over frozen VAE latents (DP-Repr baseline).

Capability parity with the reference DPVAEAgent (agent/dp_repr_agent.py):
action-sequence U-Net conditioned directly on (latent) obs features — no
learned vision encoder; frozen VAE encodes raw camera keys at inference
(reference :34-52); optional DrQ random-shift augmentation on image obs during
training (reference :135-143); optional EMA params at sampling (``use_ema``,
reference :169-179).

Note: the reference config points at a module name that doesn't exist
(agent/dp_repr_agent.yaml:1 references agent.dp_vae_agent — a latent bug);
here the class is importable where the configs say it is.
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp

from ...ops import augment
from ...ops import diffusion as dlib
from ...ops import normalize as nz
from ...train.state import EMATrainState, global_norm, make_optimizer
from ...utils.config import instantiate
from ...utils.frozen import FrozenConfig
from ..vae import KLVAE
from . import common
from .dp import _fused_action_ddim

nonpytree_field = lambda **kw: flax.struct.field(pytree_node=False, **kw)


class DPVAEAgent(flax.struct.PyTreeNode):
    planner_state: EMATrainState
    vae_params: Any
    obs_normalization: Any
    sched: dlib.DiffusionSchedule
    vae_def: KLVAE = nonpytree_field()
    lr_schedule: Any = nonpytree_field()
    config: FrozenConfig = nonpytree_field()

    # ------------------------------------------------------------------
    @property
    def _codec(self) -> common.VAECodec:
        return common.VAECodec(self.vae_def, self.config.rgb_obs,
                               self.config.vae_feature_dim)

    def _encode_obs(self, batch_obs):
        return self._codec.encode_obs(self.vae_params, batch_obs,
                                      self.obs_normalization)

    def _obs_cond(self, batch_obs) -> jnp.ndarray:
        """Flat (B, obs_horizon * D) conditioning from obs features."""
        c = self.config
        window = {k: v[:, : c.obs_horizon] for k, v in batch_obs.items()}
        emb = common.obs_cond_from_features(window, c.rgb_obs, c.lowdim_obs)
        return emb.reshape(emb.shape[0], -1)

    # ------------------------------------------------------------------
    def _loss(self, params, batch, rng):
        actions = batch["actions"]
        obs_emb = self._obs_cond(batch["obs"])
        t_rng, noise_rng = jax.random.split(rng)
        t = jax.random.randint(t_rng, (actions.shape[0],), 0,
                               self.sched.num_steps)
        noise = jax.random.normal(noise_rng, actions.shape)
        noisy = self.sched.add_noise(actions, noise, t)
        pred = self.planner_state.apply_fn({"params": params["planner"]},
                                           noisy, t, obs_emb)
        sq = jnp.square(pred - self.sched.training_target(actions, noise, t))
        loss = jnp.mean(common.weight_action_channels(
            sq, self.config.get("action_loss_weights")))
        metrics = dict(loss=loss, obs_min=jnp.min(obs_emb),
                       obs_max=jnp.max(obs_emb), obs_mean=jnp.mean(obs_emb),
                       obs_std=jnp.std(obs_emb),
                       action_min=jnp.min(actions),
                       action_max=jnp.max(actions))
        metrics.update(common.debug_obs_metrics(batch["obs"]))
        return loss, metrics

    def update(self, batch, rng, step: int = 0):
        if self.config.random_shift > 0:
            batch = dict(batch, obs=dict(batch["obs"]))
            for key, v in batch["obs"].items():
                if jnp.ndim(v) == 5:  # (B, T, H, W, C) image keys only
                    rng, sub = jax.random.split(rng)
                    B, T, H, W, C = v.shape
                    aug = augment.random_shift(sub, v.reshape(-1, H, W, C),
                                               self.config.random_shift)
                    batch["obs"][key] = aug.reshape(B, T, H, W, C)
        return self._update_step(batch, rng)

    @jax.jit
    def _update_step(self, batch, rng):
        batch = common.prepare_batch(batch, self.obs_normalization)
        batch["obs"] = self._encode_obs(batch["obs"])
        params = {"planner": self.planner_state.params}
        grads, metrics = jax.grad(self._loss, has_aux=True)(params, batch, rng)
        metrics["g_norm"] = global_norm(grads)
        new_planner = self.planner_state.apply_gradients(grads["planner"])
        metrics["planner_lr"] = self.lr_schedule(self.planner_state.step)
        metrics["planner_step"] = self.planner_state.step
        return self.replace(planner_state=new_planner), metrics

    def get_metrics(self, batch, rng):
        return self._metrics_step(batch, rng)

    @jax.jit
    def _metrics_step(self, batch, rng):
        batch = common.prepare_batch(batch, self.obs_normalization)
        batch["obs"] = self._encode_obs(batch["obs"])
        _, metrics = self._loss({"planner": self.planner_state.params}, batch, rng)
        return metrics

    # ------------------------------------------------------------------
    def sample_action(self, batch, rng):
        return self.sample(batch, rng)[0]

    def sample(self, batch, rng):
        if "actions" in batch:
            batch = jax.jit(common.prepare_batch)(batch, self.obs_normalization)
        else:
            batch = {"obs": jax.jit(nz.normalize_tree)(
                batch["obs"], self.obs_normalization["obs"])}
        return self._sample_step(batch, rng)

    @jax.jit
    def _sample_step(self, batch, rng):
        c = self.config
        obs = self._encode_obs(batch["obs"])
        obs_emb = self._obs_cond(obs)
        B = obs_emb.shape[0]
        planner_params = (self.planner_state.inference_params if c.use_ema
                          else self.planner_state.params)

        def denoise(x, t):
            return self.planner_state.apply_fn({"params": planner_params}, x, t,
                                               obs_emb)

        shape = (B, c.pred_horizon, c.action_dim)
        acts = _fused_action_ddim(c, self.sched, planner_params, obs_emb,
                                  rng, shape)
        if acts is None:
            if c.inference_steps and c.inference_steps < self.sched.num_steps:
                acts = dlib.sample_ddim(self.sched, denoise, rng, shape,
                                        c.inference_steps)
            else:
                acts = dlib.sample_ddpm(self.sched, denoise, rng, shape)
        acts = acts[:, : c.action_horizon]
        acts = nz.unnormalize_actions(acts, self.obs_normalization)
        metrics = dict(obs_min=jnp.min(obs_emb), obs_max=jnp.max(obs_emb),
                       obs_mean=jnp.mean(obs_emb), obs_std=jnp.std(obs_emb))
        return acts, metrics

    # ------------------------------------------------------------------
    def get_params(self):
        return dict(planner_params=self.planner_state.params,
                    planner_ema_params=self.planner_state.ema_params,
                    # frozen VAE rides along: snapshots are self-contained
                    vae_params=self.vae_params)

    # ------------------------------------------------------------------
    @classmethod
    def create(cls, rng, batch, shape_meta, *,
               name: str = "dp_vae",
               planner: dict,
               vae: dict | None = None,
               vae_params: Any = None,
               vae_pretrain_path: str | None = None,
               vae_feature_dim: int = 16,
               lowdim_obs=(), rgb_obs=(), obs_normalization=None,
               obs_horizon: int = 1, pred_horizon: int = 16,
               action_horizon: int = 8, n_diffusion_steps: int = 100,
               prediction_type: str = "epsilon",
               action_loss_weights=None,
               inference_steps: int | None = None,
               lr: float = 1e-4, end_lr: float = 1e-6,
               warmup_steps: int = 1000, decay_steps: int = 500_000,
               random_shift: int = 0, use_ema: bool = False,
               ema_decay: float = 0.75,
               fused_sampler="auto",
               fused_dtype: str = "bfloat16") -> "DPVAEAgent":
        obs_dim, action_dim = common.obs_dims(shape_meta, rgb_obs, lowdim_obs,
                                              vae_feature_dim)
        vae_def = KLVAE(**(vae or {}))
        if vae_params is None:
            rng, vrng = jax.random.split(rng)
            img = jnp.zeros((1, 64, 64, vae_def.in_channels))
            vae_params = vae_def.init(vrng, img, jax.random.PRNGKey(0))["params"]

        cond_dim = obs_dim * obs_horizon
        rng, prng = jax.random.split(rng)
        planner_def = instantiate(dict(planner), input_dim=action_dim,
                                  global_cond_dim=cond_dim)
        pparams = planner_def.init(prng, jnp.zeros((2, pred_horizon, action_dim)),
                                   jnp.zeros((2,), jnp.int32),
                                   jnp.zeros((2, cond_dim)))["params"]
        tx, lr_schedule = make_optimizer(lr, end_lr, warmup_steps, decay_steps)
        planner_state = EMATrainState.create(apply_fn=planner_def.apply,
                                             params=pparams, tx=tx,
                                             ema_decay=ema_decay)
        sched = dlib.DiffusionSchedule.create(n_diffusion_steps,
                                              "squaredcos_cap_v2",
                                              prediction_type=prediction_type,
                                              clip_sample=True)
        from .ldp import resolve_fused
        config = FrozenConfig(
            name=name, lowdim_obs=tuple(lowdim_obs), rgb_obs=tuple(rgb_obs),
            obs_horizon=obs_horizon, pred_horizon=pred_horizon,
            action_horizon=action_horizon, action_dim=action_dim,
            action_loss_weights=common.check_action_weights(
                action_loss_weights, action_dim),
            vae_feature_dim=vae_feature_dim, random_shift=random_shift,
            inference_steps=inference_steps, use_ema=use_ema,
            fused_dtype=fused_dtype,
            **resolve_fused(fused_sampler, planner,
                            pparams if prediction_type == "epsilon" else None,
                            None))
        stats = nz.stats_to_arrays(obs_normalization)
        return cls(planner_state=planner_state, vae_params=vae_params,
                   obs_normalization=stats, sched=sched, vae_def=vae_def,
                   lr_schedule=lr_schedule, config=config)
