"""Hierarchical LDP agent: strided planner + chunk-decoding U-Net IDM.

Capability parity with the reference LDPHierAgent (agent/ldp_hier_agent.py):
the planner denoises every ``idm_horizon``-th future latent (plan_loss,
reference :112-124), while the IDM is a ConditionalUnet1D that denoises an
``idm_horizon``-length *action chunk* conditioned on a strided (s, s') latent
pair (idm_loss, reference :125-137). At inference the decoded chunks are
flattened (B·K, T, A) → (B, K·T, A) (reference :381, :452).
Requires ``action_horizon % idm_horizon == 0`` (reference :600).
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp

from ...ops import diffusion as dlib
from ...ops import normalize as nz
from ...train.state import EMATrainState, make_optimizer
from ...utils.config import instantiate
from ...utils.frozen import FrozenConfig
from ...ops.pallas import diffusion_unet1d as punet
from ..vae import KLVAE
from . import common
from .ldp import LDPAgent, _pick_tile, resolve_fused


class LDPHierAgent(LDPAgent):

    # ------------------------------------------------------------------
    # losses (strided)
    # ------------------------------------------------------------------
    def _plan_loss(self, params, rng, obs_emb, obs_horizon):
        k = self.config.idm_horizon
        t_rng, noise_rng = jax.random.split(rng)
        B = obs_emb.shape[0]
        t = jax.random.randint(t_rng, (B,), 0, self.planner_sched.num_steps)
        target = obs_emb[:, obs_horizon::k]
        noise = jax.random.normal(noise_rng, target.shape)
        noisy = self.planner_sched.add_noise(target, noise, t)
        cond = obs_emb[:, :obs_horizon].reshape(B, -1)
        pred = self.planner_state.apply_fn({"params": params}, noisy, t, cond)
        return jnp.mean(jnp.square(
            pred - self.planner_sched.training_target(target, noise, t)))

    def _idm_loss(self, params, rng, obs_emb, actions, obs_horizon):
        k = self.config.idm_horizon
        s = obs_emb[:, obs_horizon - 1:-1:k, :]
        s_next = obs_emb[:, obs_horizon - 1 + k::k, :]
        pairs = jnp.concatenate([s, s_next], axis=-1)
        pairs = pairs.reshape(-1, pairs.shape[-1])  # (B*K, 2D)

        acts = actions[:, obs_horizon - 1:-1, :]
        acts = acts.reshape(acts.shape[0], -1, k, acts.shape[-1])
        acts = acts.reshape(-1, k, acts.shape[-1])  # (B*K, k, A)

        t_rng, noise_rng = jax.random.split(rng)
        t = jax.random.randint(t_rng, (acts.shape[0],), 0, self.idm_sched.num_steps)
        noise = jax.random.normal(noise_rng, acts.shape)
        noisy = self.idm_sched.add_noise(acts, noise, t)
        pred = self.idm_state.apply_fn({"params": params}, noisy, t, pairs)
        sq = jnp.square(pred - self.idm_sched.training_target(acts, noise, t))
        return jnp.mean(common.weight_action_channels(
            sq, self.config.get("action_loss_weights")))

    # ------------------------------------------------------------------
    # inference (chunked IDM)
    # ------------------------------------------------------------------
    def _idm_decode_chunks(self, pairs: jnp.ndarray, rng: jax.Array) -> jnp.ndarray:
        """(N, 2D) pairs → (N, idm_horizon, A) action chunks.

        DDIM decoding fuses into one Pallas kernel when the chunk U-Net
        matched the default topology at create (fused_idm_unet)."""
        c = self.config
        idm_params = self.idm_state.inference_params
        sched = self.idm_sched
        ddim = bool(c.idm_inference_steps
                    and c.idm_inference_steps < sched.num_steps)
        N = pairs.shape[0]
        shape = (N, c.idm_horizon, c.action_dim)
        divisible = (c.fused_idm_unet and c.idm_horizon %
                     (2 ** (len(c.idm_down_dims) - 1)) == 0)

        if divisible and ddim and N % _pick_tile(N, 128) == 0:
            ts, coefs = dlib.ddim_coef_table(sched, c.idm_inference_steps)
            _, init_rng = jax.random.split(rng)
            x0 = jax.random.normal(init_rng, shape, jnp.float32)
            return punet.fused_unet1d_ddim_sample(
                idm_params, pairs, x0, ts, coefs,
                down_dims=c.idm_down_dims,
                diffusion_step_embed_dim=c.idm_dsed,
                n_groups=c.idm_n_groups,
                clip_range=sched.clip_range if sched.clip_sample else 1e9,
                dtype=jnp.dtype(c.fused_dtype),
                batch_tile=_pick_tile(N, 128),
                interpret=bool(c.fused_interpret))

        def denoise(a, t):
            return self.idm_state.apply_fn({"params": idm_params}, a, t, pairs)

        if ddim:
            return dlib.sample_ddim(sched, denoise, rng, shape,
                                    c.idm_inference_steps)
        return dlib.sample_ddpm(sched, denoise, rng, shape)

    @jax.jit
    def _sample_action_step(self, batch, rng):
        obs_emb = self._obs_cond(batch["obs"])
        B = obs_emb.shape[0]
        pairs = common.consecutive_pairs(obs_emb)
        chunks = self._idm_decode_chunks(pairs, rng)
        acts = chunks.reshape(B, -1, self.config.action_dim)  # (B, K*k, A)
        return nz.unnormalize_actions(acts, self.obs_normalization)

    @jax.jit
    def _sample_fast_step(self, batch, rng):
        """Hier inference without the plan-image VAE decode (see LDPAgent)."""
        c = self.config
        obs_emb = self._obs_cond(batch["obs"])
        B = obs_emb.shape[0]
        cond = obs_emb[:, :c.obs_horizon].reshape(B, -1)
        rng, plan_rng = jax.random.split(rng)
        plan_len = c.pred_horizon // c.idm_horizon
        pred_plan = self._plan(cond, plan_rng, length=plan_len)
        plan = jnp.concatenate(
            [obs_emb[:, c.obs_horizon - 1: c.obs_horizon],
             pred_plan[:, : c.action_horizon]], axis=1)
        pairs = common.consecutive_pairs(plan)
        rng, idm_rng = jax.random.split(rng)
        chunks = self._idm_decode_chunks(pairs, idm_rng)
        acts = chunks.reshape(B, -1, c.action_dim)
        return nz.unnormalize_actions(acts, self.obs_normalization)

    @jax.jit
    def _sample_viz_step(self, batch, rng):
        c = self.config
        obs_emb = self._obs_cond(batch["obs"])
        B = obs_emb.shape[0]
        cond = obs_emb[:, :c.obs_horizon].reshape(B, -1)

        rng, plan_rng = jax.random.split(rng)
        plan_len = c.pred_horizon // c.idm_horizon
        pred_plan = self._plan(cond, plan_rng, length=plan_len)

        plan = pred_plan[:, : c.action_horizon]
        start = obs_emb[:, c.obs_horizon - 1: c.obs_horizon]
        plan = jnp.concatenate([start, plan], axis=1)

        plan_viz = self._codec.decode_features(self.vae_params, plan,
                                               self.obs_normalization)
        # each strided latent covers idm_horizon control steps in the video
        plan_viz = jnp.repeat(plan_viz[:, 1:], c.idm_horizon, axis=1)

        pairs = common.consecutive_pairs(plan)
        rng, idm_rng = jax.random.split(rng)
        chunks = self._idm_decode_chunks(pairs, idm_rng)
        acts = chunks.reshape(B, -1, c.action_dim)
        acts = nz.unnormalize_actions(acts, self.obs_normalization)
        return acts, dict(plan_viz=plan_viz, pred_plan=pred_plan,
                          obs_emb=obs_emb, plan=plan)

    # ------------------------------------------------------------------
    @classmethod
    def create(cls, rng, batch, shape_meta, *,
               name: str = "ldp_hier",
               planner: dict,
               idm_net: dict,
               idm_horizon: int = 4,
               vae: dict | None = None,
               vae_params: Any = None,
               vae_pretrain_path: str | None = None,
               vae_feature_dim: int = 16,
               use_planner: bool = True, use_idm: bool = True,
               lowdim_obs=(), rgb_obs=(), obs_normalization=None,
               data_name: str = "",
               obs_horizon: int = 1, pred_horizon: int = 8,
               action_horizon: int = 4,
               planner_n_diffusion_steps: int = 100,
               idm_n_diffusion_steps: int = 100,
               planner_prediction_type: str = "epsilon",
               idm_prediction_type: str = "epsilon",
               planner_inference_steps: int | None = None,
               idm_inference_steps: int | None = None,
               alpha_planner: float = 1.0, alpha_idm: float = 1.0,
               action_loss_weights=None,
               lr: float = 1e-4, end_lr: float = 1e-6,
               idm_lr: float = 1e-4, idm_end_lr: float = 1e-6,
               warmup_steps: int = 1000, decay_steps: int = 500_000,
               update_planner_every: int = 1, update_idm_every: int = 1,
               update_idm_after: int = 0, update_planner_until: int = -1,
               update_planner_after: int = 0,
               grad_clip: float | None = None,
               ema_decay: float = 0.0,
               fused_sampler: Any = "auto",
               fused_dtype: str = "bfloat16") -> "LDPHierAgent":
        assert action_horizon % idm_horizon == 0, (
            "action_horizon must be a multiple of idm_horizon "
            f"({action_horizon} % {idm_horizon})")
        obs_dim, action_dim = common.obs_dims(shape_meta, rgb_obs, lowdim_obs,
                                              vae_feature_dim)
        vae_def = KLVAE(**(vae or {}))
        if vae_params is None:
            rng, vrng = jax.random.split(rng)
            img = jnp.zeros((1, 64, 64, vae_def.in_channels))
            vae_params = vae_def.init(vrng, img, jax.random.PRNGKey(0))["params"]

        stats = nz.stats_to_arrays(obs_normalization)
        config = FrozenConfig(
            name=name, lowdim_obs=tuple(lowdim_obs), rgb_obs=tuple(rgb_obs),
            obs_horizon=obs_horizon, pred_horizon=pred_horizon,
            action_horizon=action_horizon, idm_horizon=idm_horizon,
            obs_dim=obs_dim, action_dim=action_dim,
            vae_feature_dim=vae_feature_dim,
            use_planner=use_planner, use_idm=use_idm,
            alpha_planner=alpha_planner, alpha_idm=alpha_idm,
            action_loss_weights=common.check_action_weights(
                action_loss_weights, action_dim),
            update_planner_every=update_planner_every,
            update_idm_every=update_idm_every,
            update_idm_after=update_idm_after,
            update_planner_until=update_planner_until,
            update_planner_after=update_planner_after,
            planner_inference_steps=planner_inference_steps,
            idm_inference_steps=idm_inference_steps, data_name=data_name)

        planner_state = None
        lr_schedule = None
        if use_planner:
            rng, sub = jax.random.split(rng)
            planner_def = instantiate(dict(planner), input_dim=obs_dim,
                                      global_cond_dim=obs_dim * obs_horizon)
            plan_len = pred_horizon // idm_horizon
            pparams = planner_def.init(
                sub, jnp.zeros((1, plan_len, obs_dim)),
                jnp.zeros((1,), jnp.int32),
                jnp.zeros((1, obs_dim * obs_horizon)))["params"]
            tx, lr_schedule = make_optimizer(lr, end_lr, warmup_steps,
                                             decay_steps, grad_clip)
            planner_state = EMATrainState.create(apply_fn=planner_def.apply,
                                                 params=pparams, tx=tx,
                                                 ema_decay=ema_decay)

        idm_state = None
        if use_idm:
            rng, sub = jax.random.split(rng)
            # chunk-decoding U-Net: sample (N, idm_horizon, A), cond (N, 2*obs_dim)
            idm_def = instantiate(dict(idm_net), input_dim=action_dim,
                                  global_cond_dim=2 * obs_dim)
            iparams = idm_def.init(
                sub, jnp.zeros((2, idm_horizon, action_dim)),
                jnp.zeros((2,), jnp.int32),
                jnp.zeros((2, 2 * obs_dim)))["params"]
            tx, sched = make_optimizer(idm_lr, idm_end_lr, warmup_steps,
                                       decay_steps, grad_clip)
            if lr_schedule is None:
                lr_schedule = sched
            idm_state = EMATrainState.create(apply_fn=idm_def.apply,
                                             params=iparams, tx=tx,
                                             ema_decay=ema_decay)

        planner_sched = dlib.DiffusionSchedule.create(
            planner_n_diffusion_steps, "squaredcos_cap_v2",
            prediction_type=planner_prediction_type, clip_sample=True)
        idm_sched = dlib.DiffusionSchedule.create(
            idm_n_diffusion_steps, "squaredcos_cap_v2",
            prediction_type=idm_prediction_type, clip_sample=True)

        # fused Pallas coef tables assume ε-parameterization (see ldp.py)
        config = config.replace(
            fused_dtype=fused_dtype,
            **resolve_fused(
                fused_sampler, planner,
                (planner_state.params if use_planner
                 and planner_prediction_type == "epsilon" else None),
                (idm_state.params if use_idm
                 and idm_prediction_type == "epsilon" else None),
                idm_unet_cfg=idm_net))

        return cls(planner_state=planner_state, idm_state=idm_state,
                   vae_params=vae_params, obs_normalization=stats,
                   planner_sched=planner_sched, idm_sched=idm_sched,
                   vae_def=vae_def, lr_schedule=lr_schedule, config=config)
