"""Shared agent machinery: observation conditioning, VAE latent codecs.

Observation convention (parity with the reference data layer): a batch is
``{"obs": {key: (B, H, ...)}, "actions": (B, T, A)}`` where H is the obs
window and T the prediction horizon. ``obs_cond`` flattens per-timestep
features into (B, H, D): rgb features first (already flat for latent keys),
then lowdim keys — matching reference get_obs_cond (agent/ldp_agent.py:88-97).
"""

from __future__ import annotations

from typing import Any, Mapping, Sequence

import jax
import jax.numpy as jnp

from ...ops import normalize as nz
from ..vae import KLVAE, latent_grid_shape


def obs_cond_from_features(batch_obs: Mapping[str, jnp.ndarray],
                           rgb_obs: Sequence[str],
                           lowdim_obs: Sequence[str]) -> jnp.ndarray:
    """Concat per-timestep rgb feature vectors + lowdim obs → (B, H, D)."""
    parts = []
    ref = batch_obs[rgb_obs[0]] if rgb_obs else batch_obs[lowdim_obs[0]]
    B, H = ref.shape[:2]
    if rgb_obs:
        feats = jnp.concatenate(
            [batch_obs[k].reshape(B, H, -1) for k in rgb_obs], axis=-1)
        parts.append(feats.astype(jnp.float32))
    if lowdim_obs:
        low = jnp.concatenate(
            [batch_obs[k].reshape(B, H, -1) for k in lowdim_obs], axis=-1)
        parts.append(low.astype(jnp.float32))
    return jnp.concatenate(parts, axis=-1)


def obs_dims(shape_meta: Mapping[str, Any], rgb_obs: Sequence[str],
             lowdim_obs: Sequence[str], rgb_feature_dim: int) -> tuple[int, int]:
    """(obs_dim, action_dim) for the given key selection."""
    import numpy as np

    lowdim = sum(int(np.prod(shape_meta["all_shapes"][k])) for k in lowdim_obs)
    return lowdim + rgb_feature_dim * len(rgb_obs), int(shape_meta["ac_dim"])


def transition_pairs(obs_emb: jnp.ndarray, obs_horizon: int) -> jnp.ndarray:
    """(s_t, s_{t+1}) pairs over the window tail → ((B*(H-obs_horizon)), 2D).

    Parity with reference idm_loss pairing (agent/ldp_agent.py:129).
    """
    s = obs_emb[:, obs_horizon - 1:-1, :]
    s_next = obs_emb[:, obs_horizon:, :]
    pair = jnp.concatenate([s, s_next], axis=-1)
    return pair.reshape(-1, pair.shape[-1])


def consecutive_pairs(plan: jnp.ndarray) -> jnp.ndarray:
    """Consecutive (s_t, s_{t+1}) pairs along a plan → (B*(T-1), 2D)."""
    pair = jnp.concatenate([plan[:, :-1, :], plan[:, 1:, :]], axis=-1)
    return pair.reshape(-1, pair.shape[-1])


class VAECodec:
    """Stateless helpers to move obs between image and normalized-latent space.

    The agent owns frozen VAE params; encode maps raw rgb keys to
    ``latent_<key>`` features (stop-gradient, min/max-normalized with the
    dataset's recorded latent bounds), decode inverts for plan visualization.
    Parity: agent/ldp_agent.py:46-85.
    """

    def __init__(self, vae_def: KLVAE, rgb_obs: Sequence[str],
                 vae_feature_dim: int):
        self.vae_def = vae_def
        self.rgb_obs = tuple(rgb_obs)  # e.g. ("latent_agentview_image",)
        self.vae_feature_dim = vae_feature_dim

    def encode_obs(self, vae_params: Any, batch_obs: Mapping[str, jnp.ndarray],
                   obs_normalization: Any) -> dict:
        """Encode any raw rgb key whose ``latent_<key>`` is an agent rgb input.

        Keys already in latent form pass through untouched (training on
        pre-processed latent datasets skips the VAE entirely).
        """
        out = {}
        for key, val in batch_obs.items():
            latent_key = f"latent_{key}"
            if latent_key not in self.rgb_obs:
                out[key] = val
                continue
            imgs = val
            B, H = imgs.shape[:2]
            flat = imgs.reshape((-1,) + imgs.shape[2:])  # (B*H, h, w, c) NHWC
            mean, _ = self.vae_def.apply({"params": vae_params}, flat,
                                         method=KLVAE.encode)
            feats = jax.lax.stop_gradient(mean.reshape(B, H, -1))
            feats = nz.normalize_tree(
                {latent_key: feats},
                {latent_key: obs_normalization["obs"][latent_key]})[latent_key]
            out[latent_key] = feats
        return out

    def decode_features(self, vae_params: Any, feats: jnp.ndarray,
                        obs_normalization: Any) -> jnp.ndarray:
        """(B, T, obs_dim) → decoded images (B, T, h, w, c) in [-1, 1]."""
        B, T = feats.shape[:2]
        h, w, c = latent_grid_shape(self.vae_feature_dim)
        z = feats[:, :, : self.vae_feature_dim].reshape(B * T, h, w, c)
        key = self.rgb_obs[0]
        z = nz.unnormalize_tree({key: z}, {key: obs_normalization["obs"][key]})[key]
        rec = self.vae_def.apply({"params": vae_params}, z, method=KLVAE.decode)
        return rec.reshape(B, T, *rec.shape[1:])


def prepare_batch(batch: Mapping[str, Any], obs_normalization: Any) -> dict:
    """Normalize a raw batch (obs + optional actions). Parity:
    utils/data_utils.py:70-80."""
    out = {"obs": nz.normalize_tree(batch["obs"], obs_normalization["obs"])}
    if "actions" in batch:
        out["actions"] = nz.normalize_tree({"actions": batch["actions"]},
                                           obs_normalization)["actions"]
    return out


def debug_obs_metrics(batch_obs: Mapping[str, jnp.ndarray]) -> dict:
    """Per-key min/max gauges (parity: agent/ldp_agent.py:173-180)."""
    out = {}
    for k, v in batch_obs.items():
        out[f"{k}_min"] = jnp.min(v)
        out[f"{k}_max"] = jnp.max(v)
    return out


def check_action_weights(weights, action_dim: int):
    """Validate a per-channel action loss weight vector at agent build time.

    Returns None (no weighting) or a length-``action_dim`` tuple. The
    weights rebalance the diffusion loss across action channels — e.g.
    upweighting the two ALOHA gripper channels, whose open/close commands
    are single scalars drowned by 12 arm-joint channels at exactly the
    grasp-critical instants (round-4 diagnosis: policy gripper close 0.71
    vs expert 0.88 at the handover). No reference analogue (the reference
    weighs all channels equally, agent/ldp_agent.py idm loss); this is an
    opt-in lever, default off.
    """
    if weights is None:
        return None
    w = tuple(float(v) for v in weights)
    if len(w) != action_dim:
        raise ValueError(
            f"action_loss_weights has {len(w)} entries for "
            f"{action_dim}-dim actions")
    if min(w) <= 0:
        raise ValueError(f"action_loss_weights must be positive: {w}")
    return w


def weight_action_channels(sq_err: jnp.ndarray, weights) -> jnp.ndarray:
    """Apply per-channel weights (mean-1 normalized) to a squared-error
    tensor whose LAST axis is the action channel. Mean-1 normalization keeps
    the total loss scale (and thus lr/alpha settings) comparable with and
    without weighting."""
    if not weights:
        return sq_err
    w = jnp.asarray(weights, sq_err.dtype)
    return sq_err * (w * (w.size / w.sum()))
