"""1-D conditional U-Net — the diffusion backbone for plans and action chunks.

Capability parity with the reference's ConditionalUnet1D
(networks/diffusion_nets_v2.py:104-169): FiLM-conditioned residual conv blocks
(Conv → GroupNorm → Mish), 2 blocks per level, strided-conv downsampling /
transposed-conv upsampling with skip concatenation, a sinusoidal
diffusion-step encoder whose output is concatenated with the global condition.

TPU-first details:
- optional ``compute_dtype`` (bfloat16) for conv/matmul compute with fp32
  params and fp32 normalization statistics — convs over the short horizon axis
  lower onto the MXU as batched matmuls;
- the horizon axis is static; the whole network traces once per (B, T, C)
  shape with no data-dependent control flow.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from .embeddings import SinusoidalPosEmb, canonical_dtype, mish

default_init = nn.initializers.xavier_uniform


class ConvBlock1D(nn.Module):
    """Conv1d(k) → GroupNorm → Mish."""

    channels: int
    kernel_size: int = 5
    n_groups: int = 8
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Conv(self.channels, kernel_size=(self.kernel_size,),
                    padding=self.kernel_size // 2,
                    dtype=canonical_dtype(self.compute_dtype),
                    param_dtype=jnp.float32)(x)
        x = nn.GroupNorm(num_groups=self.n_groups, dtype=jnp.float32)(x)
        return mish(x).astype(canonical_dtype(self.compute_dtype))


class FiLMResBlock1D(nn.Module):
    """Two conv blocks with a FiLM (scale, bias) injection from the condition."""

    channels: int
    kernel_size: int = 5
    n_groups: int = 8
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, cond: jnp.ndarray) -> jnp.ndarray:
        h = ConvBlock1D(self.channels, self.kernel_size, self.n_groups,
                        self.compute_dtype)(x)
        film = nn.Dense(2 * self.channels, kernel_init=default_init(),
                        dtype=canonical_dtype(self.compute_dtype), param_dtype=jnp.float32)(mish(cond))
        scale, bias = jnp.split(film[:, None, :], 2, axis=-1)  # (B, 1, C) each
        h = scale * h + bias
        h = ConvBlock1D(self.channels, self.kernel_size, self.n_groups,
                        self.compute_dtype)(h)
        if x.shape[-1] != self.channels:
            x = nn.Conv(self.channels, kernel_size=(1,), dtype=canonical_dtype(self.compute_dtype),
                        param_dtype=jnp.float32)(x)
        return h + x


class ConditionalUnet1D(nn.Module):
    """Denoise a (B, T, input_dim) sequence given timestep + global condition.

    ``global_cond_dim`` < 0 disables checking; otherwise the passed condition
    width must match (config typos in cond width fail loudly instead of
    silently training a differently-shaped film path).
    """

    input_dim: int
    global_cond_dim: int = -1
    diffusion_step_embed_dim: int = 256
    down_dims: Sequence[int] = (256, 512, 1024)
    kernel_size: int = 5
    n_groups: int = 8
    downsample: bool = True
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, sample: jnp.ndarray, timestep: jnp.ndarray,
                 global_cond: jnp.ndarray | None = None,
                 training: bool = True) -> jnp.ndarray:
        B, T, _ = sample.shape
        if self.downsample:
            factor = 2 ** (len(self.down_dims) - 1)
            assert T % factor == 0, (
                f"sequence length {T} must be divisible by {factor} "
                f"(downsample levels {len(self.down_dims)}); use an even "
                f"pred_horizon (e.g. horizon-1) or downsample=false")
        t = jnp.broadcast_to(jnp.asarray(timestep), (B,))

        # diffusion-step encoder: SinPosEmb → Dense(4d) → Mish → Dense(d)
        d = self.diffusion_step_embed_dim
        temb = SinusoidalPosEmb(d)(t)
        temb = nn.Dense(4 * d, kernel_init=default_init(),
                        dtype=canonical_dtype(self.compute_dtype), param_dtype=jnp.float32)(temb)
        temb = mish(temb)
        temb = nn.Dense(d, kernel_init=default_init(),
                        dtype=canonical_dtype(self.compute_dtype), param_dtype=jnp.float32)(temb)
        if global_cond is not None and self.global_cond_dim >= 0:
            assert global_cond.shape[-1] == self.global_cond_dim, (
                f"global_cond width {global_cond.shape[-1]} != configured "
                f"global_cond_dim {self.global_cond_dim}")
        cond = temb if global_cond is None else jnp.concatenate(
            [temb, global_cond.astype(temb.dtype)], axis=-1)

        x = sample.astype(canonical_dtype(self.compute_dtype))
        skips = []
        for i, ch in enumerate(self.down_dims):
            x = FiLMResBlock1D(ch, self.kernel_size, self.n_groups,
                               self.compute_dtype)(x, cond)
            x = FiLMResBlock1D(ch, self.kernel_size, self.n_groups,
                               self.compute_dtype)(x, cond)
            skips.append(x)
            if self.downsample and i < len(self.down_dims) - 1:
                x = nn.Conv(ch, kernel_size=(3,), strides=(2,),
                            dtype=canonical_dtype(self.compute_dtype), param_dtype=jnp.float32)(x)

        mid = self.down_dims[-1]
        x = FiLMResBlock1D(mid, self.kernel_size, self.n_groups,
                           self.compute_dtype)(x, cond)
        x = FiLMResBlock1D(mid, self.kernel_size, self.n_groups,
                           self.compute_dtype)(x, cond)

        for ch in reversed(self.down_dims[:-1]):
            x = jnp.concatenate([x, skips.pop()], axis=-1)
            x = FiLMResBlock1D(ch, self.kernel_size, self.n_groups,
                               self.compute_dtype)(x, cond)
            x = FiLMResBlock1D(ch, self.kernel_size, self.n_groups,
                               self.compute_dtype)(x, cond)
            if self.downsample:
                x = nn.ConvTranspose(ch, kernel_size=(4,), strides=(2,),
                                     dtype=canonical_dtype(self.compute_dtype),
                                     param_dtype=jnp.float32)(x)

        x = ConvBlock1D(self.down_dims[0], self.kernel_size, self.n_groups,
                        self.compute_dtype)(x)
        x = nn.Conv(self.input_dim, kernel_size=(1,), dtype=jnp.float32,
                    param_dtype=jnp.float32)(x)
        return x
