"""Time-step embeddings for diffusion networks.

Capability parity with the reference's SinusoidalPosEmb
(networks/diffusion_nets_v2.py:21-31) and FourierFeatures
(networks/diffusion.py:7-22).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class SinusoidalPosEmb(nn.Module):
    """Classic transformer sinusoidal embedding of (possibly fractional) steps."""

    dim: int

    @nn.compact
    def __call__(self, t: jnp.ndarray) -> jnp.ndarray:
        half = self.dim // 2
        freqs = jnp.exp(-jnp.log(10000.0) * jnp.arange(half, dtype=jnp.float32)
                        / (half - 1))
        ang = t.astype(jnp.float32)[..., None] * freqs
        return jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)


class FourierFeatures(nn.Module):
    """Random (optionally learnable) Fourier features of a scalar input.

    output = [cos(2π f x), sin(2π f x)] with f ~ N(0, 1) (dim/2 frequencies).
    """

    output_size: int = 64
    learnable: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.learnable:
            w = self.param("kernel", nn.initializers.normal(0.2),
                           (self.output_size // 2, x.shape[-1]), jnp.float32)
            f = 2.0 * jnp.pi * x.astype(jnp.float32) @ w.T
        else:
            half = self.output_size // 2
            f = x.astype(jnp.float32) * jnp.exp(
                -jnp.log(10000.0) * jnp.arange(half, dtype=jnp.float32) / (half - 1))
        return jnp.concatenate([jnp.cos(f), jnp.sin(f)], axis=-1)


class Mish(nn.Module):
    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return x * jnp.tanh(nn.softplus(x))


def mish(x: jnp.ndarray) -> jnp.ndarray:
    return x * jnp.tanh(nn.softplus(x))


def canonical_dtype(dtype) -> jnp.dtype:
    """Normalize a dtype-like (incl. config strings 'bfloat16') to jnp dtype."""
    return jnp.dtype(dtype)
