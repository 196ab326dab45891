"""Vision encoder zoo: ResNet-V1 with pluggable pooling heads.

Capability parity with the reference's networks/resnet_v1.py: ResNet basic /
bottleneck blocks with GroupNorm/LayerNorm, 7x7 stride-2 stem + maxpool,
pooling heads (spatial softmax keypoints, spatial learned embeddings, avg,
max, none), optional spatial-coordinate channels, FiLM / multiplicative
conditioning, and sigmoid/tanh/simnorm output heads. The configured baseline
encoder is ResNet-18 + GroupNorm + spatial-softmax
(reference: agent/encoder/bridge_resnet.yaml).

TPU notes: NHWC layout end-to-end (XLA's native conv layout on TPU), optional
bfloat16 compute with fp32 params/norm stats; spatial softmax reduces over a
static H*W axis.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Sequence

import flax.linen as nn
import jax.numpy as jnp

from .embeddings import canonical_dtype
from .mlp import MLP


class AddSpatialCoordinates(nn.Module):
    """Append normalized (x, y) coordinate channels."""

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h, w = x.shape[-3], x.shape[-2]
        ys = jnp.linspace(-1.0, 1.0, h, dtype=x.dtype)
        xs = jnp.linspace(-1.0, 1.0, w, dtype=x.dtype)
        grid = jnp.stack(jnp.meshgrid(xs, ys, indexing="xy"), axis=-1)  # (h, w, 2)
        grid = jnp.broadcast_to(grid, x.shape[:-3] + grid.shape)
        return jnp.concatenate([x, grid], axis=-1)


class FilmConditioning(nn.Module):
    """FiLM: per-channel scale/shift from a conditioning vector."""

    @nn.compact
    def __call__(self, x: jnp.ndarray, cond: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        add = nn.Dense(c, kernel_init=nn.initializers.zeros)(cond)
        mult = nn.Dense(c, kernel_init=nn.initializers.zeros)(cond)
        return x * (1.0 + mult[:, None, None, :]) + add[:, None, None, :]


class SpatialSoftmax(nn.Module):
    """Expected-(x, y) keypoints per channel (Levine et al. 2016).

    Returns (B, 2*C): all expected-x then all expected-y, matching the
    reference layout (networks/resnet_v1.py:92-100).
    """

    temperature: float = 1.0  # -1 => learnable

    @nn.compact
    def __call__(self, features: jnp.ndarray) -> jnp.ndarray:
        squeeze = features.ndim == 3
        if squeeze:
            features = features[None]
        B, H, W, C = features.shape
        if self.temperature == -1:
            temp = self.param("softmax_temperature", nn.initializers.ones,
                              (1,), jnp.float32)
        else:
            temp = self.temperature
        # grid matches reference meshgrid(linspace(h), linspace(w)) semantics
        pos_x, pos_y = jnp.meshgrid(jnp.linspace(-1.0, 1.0, H),
                                    jnp.linspace(-1.0, 1.0, W))
        pos_x = pos_x.reshape(-1)
        pos_y = pos_y.reshape(-1)
        flat = features.transpose(0, 3, 1, 2).reshape(B, C, H * W)
        attn = nn.softmax(flat.astype(jnp.float32) / temp, axis=-1)
        ex = jnp.sum(pos_x * attn, axis=-1)
        ey = jnp.sum(pos_y * attn, axis=-1)
        out = jnp.concatenate([ex, ey], axis=-1)
        return out[0] if squeeze else out


class SpatialLearnedEmbeddings(nn.Module):
    """Learned spatial pooling: per-feature learned attention maps."""

    num_features: int = 8

    @nn.compact
    def __call__(self, features: jnp.ndarray) -> jnp.ndarray:
        squeeze = features.ndim == 3
        if squeeze:
            features = features[None]
        B, H, W, C = features.shape
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (H, W, C, self.num_features), jnp.float32)
        out = jnp.einsum("bhwc,hwcf->bcf", features, kernel).reshape(B, -1)
        return out[0] if squeeze else out


class ResNetBlock(nn.Module):
    filters: int
    conv: Callable
    norm: Callable
    act: Callable
    strides: tuple[int, int] = (1, 1)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        residual = x
        y = self.conv(self.filters, (3, 3), self.strides)(x)
        y = self.norm()(y)
        y = self.act(y)
        y = self.conv(self.filters, (3, 3))(y)
        y = self.norm()(y)
        if residual.shape != y.shape:
            residual = self.conv(self.filters, (1, 1), self.strides,
                                 name="conv_proj")(residual)
            residual = self.norm(name="norm_proj")(residual)
        return self.act(residual + y)


class BottleneckResNetBlock(nn.Module):
    filters: int
    conv: Callable
    norm: Callable
    act: Callable
    strides: tuple[int, int] = (1, 1)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        residual = x
        y = self.conv(self.filters, (1, 1))(x)
        y = self.norm()(y)
        y = self.act(y)
        y = self.conv(self.filters, (3, 3), self.strides)(y)
        y = self.norm()(y)
        y = self.act(y)
        y = self.conv(self.filters * 4, (1, 1))(y)
        y = self.norm(scale_init=nn.initializers.zeros)(y)
        if residual.shape != y.shape:
            residual = self.conv(self.filters * 4, (1, 1), self.strides,
                                 name="conv_proj")(residual)
            residual = self.norm(name="norm_proj")(residual)
        return self.act(residual + y)


_BLOCKS = {"ResNetBlock": ResNetBlock, "BottleneckResNetBlock": BottleneckResNetBlock}


class ResNetEncoder(nn.Module):
    """ResNet-V1 feature extractor over NHWC images."""

    stage_sizes: Sequence[int] = (2, 2, 2, 2)
    block_cls: str = "ResNetBlock"
    n_filters: int = 64
    norm: str = "group"
    act: str = "relu"
    pooling_method: str = "spatial_softmax"
    softmax_temperature: float = 1.0
    n_spatial_blocks: int = 8
    feature_layers: Sequence[int] = ()
    add_spatial_coordinates: bool = False
    use_film: bool = False
    use_multiplicative_cond: bool = False
    use_sigmoid: bool = False
    use_tanh: bool = False
    use_simnorm: bool = False
    use_simnorm_rescale: bool = False
    simnorm_dim: int = 8
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True,
                 cond_var: jnp.ndarray | None = None) -> jnp.ndarray:
        assert sum([self.use_sigmoid, self.use_tanh, self.use_simnorm,
                    self.use_simnorm_rescale]) <= 1
        dtype = canonical_dtype(self.compute_dtype)
        if self.add_spatial_coordinates:
            x = AddSpatialCoordinates()(x)

        conv = partial(nn.Conv, use_bias=False, dtype=dtype,
                       param_dtype=jnp.float32,
                       kernel_init=nn.initializers.kaiming_normal())
        if self.norm == "group":
            norm = partial(nn.GroupNorm, num_groups=4, epsilon=1e-5,
                           dtype=jnp.float32)
        elif self.norm == "layer":
            norm = partial(nn.LayerNorm, epsilon=1e-5, dtype=jnp.float32)
        else:
            raise ValueError(f"unsupported norm {self.norm!r}")
        act = getattr(nn, self.act)
        block = _BLOCKS[self.block_cls]

        x = x.astype(dtype)
        x = conv(self.n_filters, (7, 7), (2, 2), padding=[(3, 3), (3, 3)],
                 name="conv_init")(x)
        x = norm(name="norm_init")(x)
        x = act(x).astype(dtype)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")

        for i, n_blocks in enumerate(self.stage_sizes):
            for j in range(n_blocks):
                strides = (2, 2) if i > 0 and j == 0 else (1, 1)
                x = block(self.n_filters * 2 ** i, conv=conv, norm=norm,
                          act=act, strides=strides)(x)
                if self.use_film:
                    assert cond_var is not None
                    x = FilmConditioning()(x, cond_var)
                if self.use_multiplicative_cond:
                    assert cond_var is not None
                    gate = nn.Dense(x.shape[-1],
                                    kernel_init=nn.initializers.xavier_normal())(cond_var)
                    x = x * gate[:, None, None, :]

        if self.pooling_method == "spatial_softmax":
            x = SpatialSoftmax(self.softmax_temperature)(x)
        elif self.pooling_method == "spatial_learned_embeddings":
            x = SpatialLearnedEmbeddings(self.n_spatial_blocks)(x)
        elif self.pooling_method == "avg":
            x = jnp.mean(x, axis=(-3, -2))
        elif self.pooling_method == "max":
            x = jnp.max(x, axis=(-3, -2))
        elif self.pooling_method == "none":
            pass
        else:
            raise ValueError(f"unknown pooling {self.pooling_method!r}")

        x = x.astype(jnp.float32)
        if len(self.feature_layers) > 0:
            x = MLP(self.feature_layers)(x)
        if self.use_sigmoid:
            x = nn.sigmoid(x)
        if self.use_tanh:
            x = jnp.tanh(x)
        if self.use_simnorm or self.use_simnorm_rescale:
            shape = x.shape
            x = x.reshape(*shape[:-1], -1, self.simnorm_dim)
            x = nn.softmax(x, axis=-1)
            if self.use_simnorm_rescale:
                x = 2.0 * x - 1.0
            x = x.reshape(shape)
        return x
