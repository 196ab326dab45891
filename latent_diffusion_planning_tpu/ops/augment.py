"""Image augmentation ops: bilinear grid sampling + DrQ random shift.

Capability parity with the reference's grid_sample_jax / random_shift_fn
(utils/flax_utils.py:41-82). Implemented directly with gather + lerp instead
of map_coordinates — vmap/jit friendly and TPU-efficient (two gathers and a
handful of fused element-wise ops per output pixel).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def grid_sample(images: jnp.ndarray, grid: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample NHWC ``images`` at normalized [-1, 1] ``grid`` coords.

    ``grid`` is (B, Ho, Wo, 2) with grid[..., 0] indexing H and grid[..., 1]
    indexing W (matching the reference's convention, utils/flax_utils.py:54-61).
    Out-of-range coords clamp to the border.
    """
    B, H, W, C = images.shape
    gy = (grid[..., 0] + 1.0) * 0.5 * (H - 1)
    gx = (grid[..., 1] + 1.0) * 0.5 * (W - 1)

    y0 = jnp.clip(jnp.floor(gy), 0, H - 1)
    x0 = jnp.clip(jnp.floor(gx), 0, W - 1)
    y1 = jnp.clip(y0 + 1, 0, H - 1)
    x1 = jnp.clip(x0 + 1, 0, W - 1)
    wy = jnp.clip(gy - y0, 0.0, 1.0)[..., None]
    wx = jnp.clip(gx - x0, 0.0, 1.0)[..., None]
    y0i, y1i = y0.astype(jnp.int32), y1.astype(jnp.int32)
    x0i, x1i = x0.astype(jnp.int32), x1.astype(jnp.int32)

    def gather(img, yi, xi):
        return img[yi, xi]  # (Ho, Wo, C) via advanced indexing

    gat = jax.vmap(gather)
    v00 = gat(images, y0i, x0i)
    v01 = gat(images, y0i, x1i)
    v10 = gat(images, y1i, x0i)
    v11 = gat(images, y1i, x1i)
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


def random_shift(rng: jax.Array, images: jnp.ndarray, pad: int) -> jnp.ndarray:
    """DrQ-style random shift: edge-pad by ``pad`` then crop at a random
    integer offset per sample. NHWC, H == W."""
    B, H, W, C = images.shape
    assert H == W, "random_shift expects square images"
    padded = jnp.pad(images, ((0, 0), (pad, pad), (pad, pad), (0, 0)),
                     mode="edge")

    shift = jax.random.randint(rng, (B, 2), 0, 2 * pad + 1)

    def crop(img, off):
        return jax.lax.dynamic_slice(img, (off[0], off[1], 0), (H, W, C))

    return jax.vmap(crop)(padded, shift)
