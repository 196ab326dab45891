"""In-house KL autoencoder (β-VAE) for 64×64 camera frames, NHWC / TPU-native.

Replaces the reference's dependency on ``diffusers.FlaxAutoencoderKL``
(reference: model/stable_vae_model.py + model/stable_vae_model.yaml: 6
down/up blocks, block_out_channels [128,256,256,256,256,256],
layers_per_block 2, latent_channels 4, GroupNorm(32), silu — 64×64×3 input
→ 2×2×4 = 16-dim latent). Same capability, re-designed:

- NHWC end-to-end (XLA's native TPU conv layout; diffusers is NCHW),
- optional bfloat16 compute with fp32 params and fp32 GroupNorm,
- mid-block self-attention over the (tiny) bottleneck token grid,
- encode returns (mean, logvar) arrays — the "latent dist" is plain math,
  jit/vmap/shard-friendly with no wrapper objects.

``VAEModel`` is the training wrapper (parity with StableVAEModel: recon MSE +
β·KL on the first frame of every rgb key, EMA params used at inference).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import flax.struct
import jax
import jax.numpy as jnp

from ..ops import normalize as nz
from ..train.state import EMATrainState, make_optimizer
from ..utils.frozen import FrozenConfig

nonpytree_field = lambda **kw: flax.struct.field(pytree_node=False, **kw)


class ResBlock2D(nn.Module):
    channels: int
    norm_groups: int = 32
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # norms run in the compute dtype: fp32 GroupNorm traffic at 64x64
        # was measured as ~97% of rollout wall time (RESULTS.md); params
        # stay fp32
        h = nn.GroupNorm(num_groups=min(self.norm_groups, x.shape[-1]),
                         dtype=self.compute_dtype)(x)
        h = nn.silu(h).astype(self.compute_dtype)
        h = nn.Conv(self.channels, (3, 3), padding=1, dtype=self.compute_dtype,
                    param_dtype=jnp.float32)(h)
        h = nn.GroupNorm(num_groups=min(self.norm_groups, self.channels),
                         dtype=self.compute_dtype)(h)
        h = nn.silu(h).astype(self.compute_dtype)
        h = nn.Conv(self.channels, (3, 3), padding=1, dtype=self.compute_dtype,
                    param_dtype=jnp.float32)(h)
        if x.shape[-1] != self.channels:
            x = nn.Conv(self.channels, (1, 1), dtype=self.compute_dtype,
                        param_dtype=jnp.float32, name="shortcut")(x)
        return x + h


class MidAttention(nn.Module):
    """Single-head self-attention over the bottleneck spatial grid."""

    norm_groups: int = 32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B, H, W, C = x.shape
        h = nn.GroupNorm(num_groups=min(self.norm_groups, C),
                         dtype=jnp.float32)(x)
        h = h.reshape(B, H * W, C)
        q = nn.Dense(C)(h)
        k = nn.Dense(C)(h)
        v = nn.Dense(C)(h)
        attn = jax.nn.softmax(q @ k.transpose(0, 2, 1) / jnp.sqrt(C), axis=-1)
        out = nn.Dense(C)(attn @ v).reshape(B, H, W, C)
        return x + out


class Encoder(nn.Module):
    block_out_channels: Sequence[int]
    latent_channels: int
    layers_per_block: int = 2
    norm_groups: int = 32
    use_mid_attention: bool = True
    compute_dtype: Any = jnp.float32
    patch_size: int = 1
    downsample_pad: str = "same"   # "diffusers" = asymmetric ((0,1),(0,1))

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
        dt = self.compute_dtype
        x = x.astype(dt)
        if self.patch_size > 1:
            # Patchified stem (TPU-first): one stride-p conv folds the full-
            # resolution grid into MXU-shaped matmuls. A conventional conv
            # stack at 64x64 with <128 channels runs at <20% MXU utilization
            # (measured, RESULTS.md round 2); the patch stem moves all
            # spatial work to <=16x16 where channel dims fill the 128-lane
            # systolic array.
            p = self.patch_size
            x = nn.Conv(self.block_out_channels[0], (p, p), strides=(p, p),
                        dtype=dt, param_dtype=jnp.float32, name="patch_stem")(x)
        else:
            x = nn.Conv(self.block_out_channels[0], (3, 3), padding=1,
                        dtype=dt, param_dtype=jnp.float32)(x)
        for i, ch in enumerate(self.block_out_channels):
            for _ in range(self.layers_per_block):
                x = ResBlock2D(ch, self.norm_groups, dt)(x)
            if i < len(self.block_out_channels) - 1:
                # diffusers FlaxDownsample2D pads ((0,1),(0,1)) before a
                # VALID stride-2 conv; 'same' is this framework's default.
                pad = (((0, 1), (0, 1)) if self.downsample_pad == "diffusers"
                       else 1)
                x = nn.Conv(ch, (3, 3), strides=(2, 2), padding=pad, dtype=dt,
                            param_dtype=jnp.float32)(x)
        x = ResBlock2D(self.block_out_channels[-1], self.norm_groups, dt)(x)
        if self.use_mid_attention:
            x = MidAttention(self.norm_groups)(x.astype(jnp.float32)).astype(dt)
        x = ResBlock2D(self.block_out_channels[-1], self.norm_groups, dt)(x)
        x = nn.GroupNorm(num_groups=min(self.norm_groups, x.shape[-1]),
                         dtype=jnp.float32)(x)
        x = nn.silu(x).astype(dt)
        x = nn.Conv(2 * self.latent_channels, (3, 3), padding=1,
                    dtype=jnp.float32, param_dtype=jnp.float32)(x)
        x = nn.Conv(2 * self.latent_channels, (1, 1), dtype=jnp.float32,
                    param_dtype=jnp.float32, name="quant_conv")(x)
        mean, logvar = jnp.split(x, 2, axis=-1)
        return mean, jnp.clip(logvar, -30.0, 20.0)


class Decoder(nn.Module):
    block_out_channels: Sequence[int]
    out_channels: int = 3
    layers_per_block: int = 2
    norm_groups: int = 32
    use_mid_attention: bool = True
    compute_dtype: Any = jnp.float32
    patch_size: int = 1

    @nn.compact
    def __call__(self, z: jnp.ndarray) -> jnp.ndarray:
        dt = self.compute_dtype
        z = nn.Conv(z.shape[-1], (1, 1), dtype=jnp.float32,
                    param_dtype=jnp.float32, name="post_quant_conv")(z)
        x = nn.Conv(self.block_out_channels[-1], (3, 3), padding=1, dtype=dt,
                    param_dtype=jnp.float32)(z.astype(dt))
        x = ResBlock2D(self.block_out_channels[-1], self.norm_groups, dt)(x)
        if self.use_mid_attention:
            x = MidAttention(self.norm_groups)(x.astype(jnp.float32)).astype(dt)
        x = ResBlock2D(self.block_out_channels[-1], self.norm_groups, dt)(x)
        for i, ch in enumerate(reversed(self.block_out_channels)):
            for _ in range(self.layers_per_block + 1):
                x = ResBlock2D(ch, self.norm_groups, dt)(x)
            if i < len(self.block_out_channels) - 1:
                B, H, W, C = x.shape
                x = jax.image.resize(x, (B, H * 2, W * 2, C), method="nearest")
                x = nn.Conv(ch, (3, 3), padding=1, dtype=dt,
                            param_dtype=jnp.float32)(x)
        x = nn.GroupNorm(num_groups=min(self.norm_groups, x.shape[-1]),
                         dtype=jnp.float32)(x)
        x = nn.silu(x).astype(dt)
        if self.patch_size > 1:
            # un-patchify head: predict p*p*C per cell, pixel-shuffle out.
            p = self.patch_size
            x = nn.Conv(self.out_channels * p * p, (3, 3), padding=1,
                        dtype=jnp.float32, param_dtype=jnp.float32,
                        name="unpatch_head")(x)
            B, H, W, _ = x.shape
            x = x.reshape(B, H, W, p, p, self.out_channels)
            x = x.transpose(0, 1, 3, 2, 4, 5).reshape(
                B, H * p, W * p, self.out_channels)
        else:
            x = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=jnp.float32,
                        param_dtype=jnp.float32)(x)
        return x


class KLVAE(nn.Module):
    """Full autoencoder; images NHWC in [-1, 1].

    ``patch_size`` > 1 selects the TPU-first patchified variant: the encoder
    stem is a stride-p pxp conv and the decoder head a pixel-shuffle — same
    latent geometry at a fraction of the (MXU-hostile) full-resolution conv
    work. patch_size=1 reproduces the reference AutoencoderKL topology
    (model/stable_vae_model.yaml).
    """

    block_out_channels: Sequence[int] = (128, 256, 256, 256, 256, 256)
    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 4
    layers_per_block: int = 2
    norm_groups: int = 32
    use_mid_attention: bool = True
    compute_dtype: Any = jnp.float32
    patch_size: int = 1
    downsample_pad: str = "same"   # "diffusers" for transferred checkpoints

    def setup(self) -> None:
        dt = jnp.dtype(self.compute_dtype)
        self.encoder = Encoder(self.block_out_channels, self.latent_channels,
                               self.layers_per_block, self.norm_groups,
                               self.use_mid_attention, dt, self.patch_size,
                               self.downsample_pad)
        self.decoder = Decoder(self.block_out_channels, self.out_channels,
                               self.layers_per_block, self.norm_groups,
                               self.use_mid_attention, dt, self.patch_size)

    @property
    def n_downsample(self) -> int:
        p, n = self.patch_size, 0
        while p > 1:
            p //= 2
            n += 1
        return n + len(self.block_out_channels) - 1

    def encode(self, x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
        return self.encoder(x)

    def decode(self, z: jnp.ndarray) -> jnp.ndarray:
        return self.decoder(z)

    def __call__(self, x: jnp.ndarray,
                 z_rng: jax.Array | None = None) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        mean, logvar = self.encode(x)
        if z_rng is None:
            z = mean
        else:
            z = mean + jnp.exp(0.5 * logvar) * jax.random.normal(
                z_rng, mean.shape, mean.dtype)
        return self.decode(z), mean, logvar


def kl_divergence(mean: jnp.ndarray, logvar: jnp.ndarray) -> jnp.ndarray:
    """KL(q || N(0, I)) per sample, summed over latent dims."""
    axes = tuple(range(1, mean.ndim))
    return 0.5 * jnp.sum(jnp.square(mean) + jnp.exp(logvar) - 1.0 - logvar,
                         axis=axes)


def latent_grid_shape(feature_dim: int) -> tuple[int, int, int]:
    """Map a flat latent feature dim to its (h, w, c) grid.

    Parity with the reference's vae_decode dispatch (agent/ldp_agent.py:66-80).
    """
    table = {16: (2, 2, 4), 32: (2, 2, 8), 36: (3, 3, 4), 64: (4, 4, 4)}
    if feature_dim not in table:
        raise ValueError(f"unsupported vae_feature_dim {feature_dim}")
    return table[feature_dim]


class VAEModel(flax.struct.PyTreeNode):
    """Training wrapper for KLVAE (parity: model/stable_vae_model.py).

    Trains on the first frame of every rgb obs key with recon MSE + β·KL;
    EMA params serve reconstruction/sampling.
    """

    vae_state: EMATrainState
    obs_normalization: Any
    vae_def: KLVAE = nonpytree_field()
    lr_schedule: Any = nonpytree_field()
    config: FrozenConfig = nonpytree_field()

    # -- losses -------------------------------------------------------------
    def loss(self, params, batch, rng):
        imgs = jnp.concatenate(
            [batch["obs"][k][:, 0] for k in self.config.rgb_obs], axis=0)
        z_rng, _ = jax.random.split(rng)
        rec, mean, logvar = self.vae_def.apply({"params": params}, imgs, z_rng)
        mse = jnp.mean(jnp.square(imgs - rec))
        kl = jnp.mean(kl_divergence(mean, logvar)) if self.config.use_kl else 0.0
        loss = mse + self.config.beta * kl
        metrics = dict(loss=loss, loss_mse=mse, loss_kl=kl,
                       img_min=jnp.min(imgs), img_max=jnp.max(imgs),
                       z_min=jnp.min(mean), z_max=jnp.max(mean),
                       z_mean=jnp.mean(mean), z_std=jnp.std(mean))
        return loss, metrics

    def update(self, batch, rng, step=None):
        return self._update_step(batch, rng)

    @jax.jit
    def _update_step(self, batch, rng):
        batch = nz.normalize_batch(batch, self.obs_normalization)
        grads, metrics = jax.grad(self.loss, has_aux=True)(
            self.vae_state.params, batch, rng)
        new_state = self.vae_state.apply_gradients(grads)
        metrics["vae_lr"] = self.lr_schedule(self.vae_state.step)
        metrics["vae_step"] = self.vae_state.step
        return self.replace(vae_state=new_state), metrics

    def get_metrics(self, batch, rng):
        return self._metrics_step(batch, rng)

    @jax.jit
    def _metrics_step(self, batch, rng):
        batch = nz.normalize_batch(batch, self.obs_normalization)
        _, metrics = self.loss(self.vae_state.params, batch, rng)
        return metrics

    # -- inference ----------------------------------------------------------
    @jax.jit
    def encode_mode(self, imgs: jnp.ndarray) -> jnp.ndarray:
        """Latent mean of already-normalized [-1,1] NHWC images (EMA params)."""
        mean, _ = self.vae_def.apply({"params": self.vae_state.inference_params},
                                     imgs, method=KLVAE.encode)
        return mean

    @jax.jit
    def decode(self, z: jnp.ndarray) -> jnp.ndarray:
        return self.vae_def.apply({"params": self.vae_state.inference_params},
                                  z, method=KLVAE.decode)

    def reconstruct(self, batch):
        """Reconstruct the first frame of the first rgb key of a raw batch."""
        key = self.config.rgb_obs[0]
        obs = nz.normalize_tree({key: batch["obs"][key][:, 0]},
                                {key: self.obs_normalization["obs"][key]})[key]
        z = self.encode_mode(obs)
        rec = self.decode(z)
        return nz.unnormalize_tree({key: rec},
                                   {key: self.obs_normalization["obs"][key]})[key]

    def sample(self, rng, n: int):
        """Decode prior samples z ~ N(0, I)."""
        h, w, c = self.latent_hw()
        z = jax.random.normal(rng, (n, h, w, c))
        key = self.config.rgb_obs[0]
        rec = self.decode(z)
        return nz.unnormalize_tree({key: rec},
                                   {key: self.obs_normalization["obs"][key]})[key]

    def latent_hw(self) -> tuple[int, int, int]:
        s = self.config.image_size // (2 ** self.vae_def.n_downsample)
        return (s, s, self.vae_def.latent_channels)

    def get_params(self):
        return {"vae_params": self.vae_state.params,
                "vae_ema_params": self.vae_state.ema_params}

    # -- construction -------------------------------------------------------
    @classmethod
    def create(cls, rng, batch, *, name: str = "klvae",
               vae: dict | None = None, use_kl: bool = True,
               beta: float = 1e-5, rgb_obs: Sequence[str],
               obs_normalization: Any, data_name: str = "",
               lr: float = 1e-4, end_lr: float = 1e-6,
               warmup_steps: int = 1000, decay_steps: int = 300_000,
               ema_decay: float = 0.99, image_size: int = 64) -> "VAEModel":
        vae_def = KLVAE(**(vae or {}))
        init_img = jnp.zeros((2, image_size, image_size, vae_def.in_channels),
                             jnp.float32)
        params = vae_def.init(rng, init_img, jax.random.PRNGKey(0))["params"]
        tx, schedule = make_optimizer(lr, end_lr, warmup_steps, decay_steps)
        state = EMATrainState.create(apply_fn=vae_def.apply, params=params,
                                     tx=tx, ema_decay=ema_decay)
        config = FrozenConfig(name=name, use_kl=use_kl, beta=beta,
                              rgb_obs=tuple(rgb_obs), data_name=data_name,
                              image_size=image_size)
        stats = nz.stats_to_arrays(obs_normalization)
        return cls(vae_state=state, obs_normalization=stats, vae_def=vae_def,
                   lr_schedule=schedule, config=config)
