"""Diffusion Policy baseline: end-to-end ResNet encoders + action U-Net.

Capability parity with the reference DPAgent (agent/dp_agent.py): per-camera
(or shared) ResNet encoders trained jointly, a ConditionalUnet1D denoising
*action* sequences conditioned on the flat obs embedding, EMA tracked on both
planner and encoders (reference :125-133), receding-horizon slicing of the
first ``action_horizon`` actions at sampling (reference :186-189).
"""

from __future__ import annotations

from functools import partial
from typing import Any

import flax.struct
import jax
import jax.numpy as jnp

from ...ops import diffusion as dlib
from ...ops import normalize as nz
from ...train.state import EMATrainState, global_norm, make_optimizer
from ...utils.config import instantiate
from ...utils.frozen import FrozenConfig
from . import common

nonpytree_field = lambda **kw: flax.struct.field(pytree_node=False, **kw)



def _fused_action_ddim(config, sched, planner_params, obs_emb, rng, shape):
    """Fused Pallas DDIM over the action U-Net (None → caller falls back)."""
    from .ldp import _pick_tile
    from ...ops.pallas import diffusion_unet1d as punet
    from ...ops import diffusion as dlib
    import jax
    import jax.numpy as jnp

    B, T, _ = shape
    c = config
    ddim = bool(c.inference_steps and c.inference_steps < sched.num_steps)
    eligible = (c.fused_planner and ddim
                and T % (2 ** (len(c.planner_down_dims) - 1)) == 0
                and B % _pick_tile(B, 128) == 0)
    if not eligible:
        return None
    ts, coefs = dlib.ddim_coef_table(sched, c.inference_steps)
    _, init_rng = jax.random.split(rng)
    x0 = jax.random.normal(init_rng, shape, jnp.float32)
    return punet.fused_unet1d_ddim_sample(
        planner_params, obs_emb, x0, ts, coefs,
        down_dims=c.planner_down_dims,
        diffusion_step_embed_dim=c.planner_dsed,
        n_groups=c.planner_n_groups,
        clip_range=sched.clip_range if sched.clip_sample else 1e9,
        dtype=jnp.dtype(c.fused_dtype),
        batch_tile=_pick_tile(B, 128),
        interpret=bool(c.fused_interpret))


class DPAgent(flax.struct.PyTreeNode):
    planner_state: EMATrainState
    encoder_states: dict[str, EMATrainState]
    obs_normalization: Any
    sched: dlib.DiffusionSchedule
    lr_schedule: Any = nonpytree_field()
    config: FrozenConfig = nonpytree_field()

    # ------------------------------------------------------------------
    def _obs_cond(self, encoder_params: dict, batch_obs) -> jnp.ndarray:
        """Flat conditioning vector (B, obs_horizon * (vision + lowdim)).

        Parity: agent/dp_agent.py:31-52.
        """
        c = self.config
        oh = c.obs_horizon
        low = jnp.concatenate(
            [batch_obs[k][:, :oh].astype(jnp.float32) for k in c.lowdim_obs],
            axis=-1)
        B = low.shape[0]
        low = low.reshape(B, -1)
        if c.shared_encoder:
            imgs = jnp.concatenate([batch_obs[k][:, :oh] for k in c.rgb_obs],
                                   axis=1)
            flat = imgs.reshape((-1,) + imgs.shape[-3:])
            feats = self.encoder_states["shared"].apply_fn(
                {"params": encoder_params["shared"]}, flat)
            feats = feats.reshape(B, -1)
        else:
            per_cam = []
            for k in c.rgb_obs:
                flat = batch_obs[k][:, :oh].reshape((-1,) + batch_obs[k].shape[-3:])
                f = self.encoder_states[k].apply_fn(
                    {"params": encoder_params[k]}, flat)
                per_cam.append(f.reshape(B, -1))
            feats = jnp.concatenate(per_cam, axis=-1)
        return jnp.concatenate([feats, low], axis=-1)

    # ------------------------------------------------------------------
    def _loss(self, params, batch, rng):
        actions = batch["actions"]
        obs_emb = self._obs_cond(params["encoder"], batch["obs"])
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
                       action_min=jnp.min(actions), action_max=jnp.max(actions))
        return loss, metrics

    def update(self, batch, rng, step: int = 0):
        return self._update_step(batch, rng)

    @jax.jit
    def _update_step(self, batch, rng):
        batch = common.prepare_batch(batch, self.obs_normalization)
        enc_params = {k: s.params for k, s in self.encoder_states.items()}
        params = {"planner": self.planner_state.params, "encoder": enc_params}
        grads, metrics = jax.grad(self._loss, has_aux=True)(params, batch, rng)
        metrics["g_norm"] = global_norm(grads)

        new_planner = self.planner_state.apply_gradients(grads["planner"])
        metrics["planner_lr"] = self.lr_schedule(self.planner_state.step)
        metrics["planner_step"] = self.planner_state.step
        new_encoders = {}
        for k, st in self.encoder_states.items():
            new_encoders[k] = st.apply_gradients(grads["encoder"][k])
            metrics[f"enc_{k}_lr"] = self.lr_schedule(st.step)
        return self.replace(planner_state=new_planner,
                            encoder_states=new_encoders), metrics

    def get_metrics(self, batch, rng):
        return self._metrics_step(batch, rng)

    @jax.jit
    def _metrics_step(self, batch, rng):
        batch = common.prepare_batch(batch, self.obs_normalization)
        enc_params = {k: s.params for k, s in self.encoder_states.items()}
        params = {"planner": self.planner_state.params, "encoder": enc_params}
        _, metrics = self._loss(params, batch, rng)
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
        action, metrics = self._sample_step(batch, rng)
        metrics.update({f"{k}_min": jnp.min(v) for k, v in batch["obs"].items()})
        metrics.update({f"{k}_max": jnp.max(v) for k, v in batch["obs"].items()})
        return action, metrics

    @jax.jit
    def _sample_step(self, batch, rng):
        c = self.config
        use_ema = bool(c.use_ema)
        enc_params = {k: (s.inference_params if use_ema else s.params)
                      for k, s in self.encoder_states.items()}
        planner_params = (self.planner_state.inference_params if use_ema
                          else self.planner_state.params)
        obs_emb = self._obs_cond(enc_params, batch["obs"])
        B = obs_emb.shape[0]

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
        enc = {f"{k}_params": s.params for k, s in self.encoder_states.items()}
        enc_ema = {f"{k}_params": s.ema_params
                   for k, s in self.encoder_states.items()}
        return dict(planner_params=self.planner_state.params,
                    encoder_params=enc,
                    planner_ema_params=self.planner_state.ema_params,
                    encoder_ema_params=enc_ema)

    # ------------------------------------------------------------------
    @classmethod
    def create(cls, rng, batch, shape_meta, *,
               name: str = "dp",
               planner: dict, encoder: dict,
               lowdim_obs=(), rgb_obs=(), obs_normalization=None,
               obs_horizon: int = 1, pred_horizon: int = 16,
               action_horizon: int = 8, n_diffusion_steps: int = 100,
               prediction_type: str = "epsilon",
               action_loss_weights=None,
               inference_steps: int | None = None,
               lr: float = 1e-4, end_lr: float = 1e-6,
               warmup_steps: int = 1000, decay_steps: int = 500_000,
               shared_encoder: bool = False,
               planner_ema_decay: float = 0.75,
               encoder_ema_decay: float = 0.75,
               use_ema: bool = False,
               encoder_feature_dim: int = 1024,
               fused_sampler="auto", fused_dtype: str = "bfloat16") -> "DPAgent":
        import numpy as np

        lowdim_dim = sum(int(np.prod(shape_meta["all_shapes"][k]))
                         for k in lowdim_obs)
        action_dim = int(shape_meta["ac_dim"])

        # encoders
        enc_keys = ["shared"] if shared_encoder else list(rgb_obs)
        rng, *enc_rngs = jax.random.split(rng, 1 + len(enc_keys))
        encoder_states = {}
        feat_dims = {}
        for key, erng in zip(enc_keys, enc_rngs):
            enc_def = instantiate(dict(encoder))
            img_key = rgb_obs[0] if key == "shared" else key
            img_shape = tuple(shape_meta["all_shapes"][img_key])
            init_img = jnp.zeros((2,) + img_shape, jnp.float32)
            eparams = enc_def.init(erng, init_img)["params"]
            feat = enc_def.apply({"params": eparams}, init_img)
            feat_dims[key] = feat.shape[-1]
            tx, lr_schedule = make_optimizer(lr, end_lr, warmup_steps,
                                             decay_steps)
            encoder_states[key] = EMATrainState.create(
                apply_fn=enc_def.apply, params=eparams, tx=tx,
                ema_decay=encoder_ema_decay)
        vision_dim = (feat_dims["shared"] * len(rgb_obs) if shared_encoder
                      else sum(feat_dims.values()))
        cond_dim = (vision_dim + lowdim_dim) * obs_horizon

        # planner over action sequences
        rng, prng = jax.random.split(rng)
        planner_def = instantiate(dict(planner), input_dim=action_dim,
                                  global_cond_dim=cond_dim)
        pparams = planner_def.init(prng, jnp.zeros((2, pred_horizon, action_dim)),
                                   jnp.zeros((2,), jnp.int32),
                                   jnp.zeros((2, cond_dim)))["params"]
        tx, lr_schedule = make_optimizer(lr, end_lr, warmup_steps, decay_steps)
        planner_state = EMATrainState.create(apply_fn=planner_def.apply,
                                             params=pparams, tx=tx,
                                             ema_decay=planner_ema_decay)

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
            shared_encoder=shared_encoder, inference_steps=inference_steps,
            use_ema=use_ema, fused_dtype=fused_dtype,
            **resolve_fused(fused_sampler, planner,
                            pparams if prediction_type == "epsilon" else None,
                            None))
        stats = nz.stats_to_arrays(obs_normalization)
        return cls(planner_state=planner_state, encoder_states=encoder_states,
                   obs_normalization=stats, sched=sched,
                   lr_schedule=lr_schedule, config=config)
