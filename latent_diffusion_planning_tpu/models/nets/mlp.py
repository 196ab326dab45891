"""MLP network family: plain MLP, residual MLP, and the diffusion IDM head.

Capability parity with the reference's networks/mlp_nets.py (MLP with
configurable activation/init/layernorm/dropout/tanh head),
networks/mlp_diffusion_nets.py (MLPResNetBlock, MLPResNet, MLPDiffusion).
The IDM composes: time Fourier features → cond MLP → concat [action, state,
cond] → residual MLP trunk → action-dim output.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import flax.linen as nn
import jax.numpy as jnp

from .embeddings import FourierFeatures, canonical_dtype, mish

default_init = nn.initializers.xavier_uniform


def _activation(name: str) -> Callable:
    if name == "relu":
        return nn.relu
    if name == "mish":
        return mish
    if name == "gelu":
        return nn.gelu
    if name == "swish":
        return nn.swish
    raise ValueError(f"unknown activation {name!r}")


def _kernel_init(name: str):
    if name == "xavier":
        return nn.initializers.xavier_uniform()
    if name == "kaiming":
        return nn.initializers.kaiming_uniform()
    if name == "lecun":
        return nn.initializers.lecun_normal()
    raise ValueError(f"unknown init {name!r}")


class MLP(nn.Module):
    """Configurable MLP (reference: networks/mlp_nets.py:49-97)."""

    hidden_dims: Sequence[int]
    activation: str = "relu"
    kernel_init: str = "xavier"
    activate_final: bool = False
    use_layer_norm: bool = False
    dropout_rate: float | None = None
    tanh_output: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, training: bool = False) -> jnp.ndarray:
        act = _activation(self.activation)
        for i, h in enumerate(self.hidden_dims):
            x = nn.Dense(h, kernel_init=_kernel_init(self.kernel_init))(x)
            last = i == len(self.hidden_dims) - 1
            if not last or self.activate_final:
                if self.dropout_rate and self.dropout_rate > 0:
                    x = nn.Dropout(rate=self.dropout_rate)(
                        x, deterministic=not training)
                if self.use_layer_norm:
                    x = nn.LayerNorm()(x)
                x = act(x)
        if self.tanh_output:
            x = jnp.tanh(x)
        return x


class MLPResNetBlock(nn.Module):
    """Pre-norm residual MLP block: LN → Dense(4h) → act → Dense(h) + skip."""

    features: int
    activation: str = "relu"
    use_layer_norm: bool = True
    dropout_rate: float | None = None
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, training: bool = False) -> jnp.ndarray:
        act = _activation(self.activation)
        dt = canonical_dtype(self.compute_dtype)
        residual = x
        if self.dropout_rate and self.dropout_rate > 0:
            x = nn.Dropout(rate=self.dropout_rate)(x, deterministic=not training)
        if self.use_layer_norm:
            x = nn.LayerNorm(dtype=jnp.float32)(x)
        x = nn.Dense(self.features * 4, dtype=dt, param_dtype=jnp.float32)(x)
        x = act(x)
        x = nn.Dense(self.features, dtype=dt, param_dtype=jnp.float32)(x)
        if residual.shape != x.shape:
            residual = nn.Dense(self.features, dtype=dt,
                                param_dtype=jnp.float32)(residual)
        return residual + x


class MLPResNet(nn.Module):
    """Residual MLP trunk (reference: networks/mlp_diffusion_nets.py:32-48)."""

    n_blocks: int
    out_dim: int
    hidden_dim: int = 256
    activation: str = "relu"
    use_layer_norm: bool = True
    dropout_rate: float | None = None
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, training: bool = False) -> jnp.ndarray:
        act = _activation(self.activation)
        dt = canonical_dtype(self.compute_dtype)
        x = nn.Dense(self.hidden_dim, kernel_init=default_init(), dtype=dt,
                     param_dtype=jnp.float32)(x)
        for _ in range(self.n_blocks):
            x = MLPResNetBlock(self.hidden_dim, self.activation,
                               self.use_layer_norm, self.dropout_rate,
                               self.compute_dtype)(x, training=training)
        x = act(x)
        return nn.Dense(self.out_dim, kernel_init=default_init(),
                        dtype=jnp.float32, param_dtype=jnp.float32)(x)


class MLPDiffusion(nn.Module):
    """Diffusion MLP for the inverse dynamics model.

    Denoises an action ``a`` conditioned on a state(-pair) embedding ``s`` and
    the diffusion timestep (reference: networks/mlp_diffusion_nets.py:50-67).
    """

    out_dim: int
    time_dim: int = 64
    cond_hidden_dims: Sequence[int] = (128, 128)
    cond_activation: str = "swish"   # reference recipe uses "mish"
    n_blocks: int = 3
    hidden_dim: int = 256
    use_layer_norm: bool = True
    dropout_rate: float | None = None
    learnable_time: bool = True
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, s: jnp.ndarray, a: jnp.ndarray, t: jnp.ndarray,
                 training: bool = False) -> jnp.ndarray:
        t = jnp.broadcast_to(jnp.asarray(t, dtype=jnp.float32).reshape(-1, 1)
                             if jnp.ndim(t) <= 1 else t, (s.shape[0], 1))
        t_ff = FourierFeatures(self.time_dim, self.learnable_time)(t)
        cond = MLP(self.cond_hidden_dims, activation=self.cond_activation,
                   activate_final=False)(t_ff, training=training)
        x = jnp.concatenate([a, s, cond], axis=-1)
        return MLPResNet(self.n_blocks, self.out_dim, self.hidden_dim,
                         use_layer_norm=self.use_layer_norm,
                         dropout_rate=self.dropout_rate,
                         compute_dtype=self.compute_dtype)(x, training=training)
