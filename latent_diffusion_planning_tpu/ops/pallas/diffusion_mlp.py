"""Pallas TPU kernel: fused reverse-diffusion sampler for the MLP IDM.

The IDM decode (LDPAgent._idm_decode; reference agent/ldp_agent.py:486-503)
runs the MLPDiffusion network ``T`` times sequentially. As an XLA scan each
evaluation is ~15 small ops (Fourier features, cond MLP, LayerNorms, 8
matmuls) on (N, <=1024) operands — latency-bound at ~1.3 ms/eval, so a
25-step decode costs ~32 ms/decision. This kernel runs the *entire* reverse
process in one ``pallas_call``: network weights load into VMEM once per batch
tile and stay resident across all T steps; per-step work is pure MXU/VPU math
with zero dispatch overhead.

Layout: everything runs transposed — features on sublanes, batch on lanes —
because the action dim (7..14) would otherwise pad to 128 lanes and blow the
(T, N, A) noise buffer up 18x. In transposed space no per-step relayouts are
needed: matmuls are W^T @ h, LayerNorm reduces over the sublane axis, biases
are (h, 1) columns broadcast along lanes.

Exact-parity design: the caller supplies the initial sample and every step's
DDPM noise (drawn with the same jax.random keys the XLA sampler uses) plus
the unified (T, 5) coefficient table (ops/diffusion.ddpm/ddim_coef_table), so
fused and unfused samplers produce matching trajectories (up to fp
reassociation) and one golden test covers both.

Network parity: MLPDiffusion (models/nets/mlp.py:126-155) with its default
topology — learnable FourierFeatures(time_dim), cond MLP (128, 128, swish),
trunk Dense(hidden) → n_blocks × [LayerNorm → Dense(4h) → relu → Dense(h) +
skip] → relu → Dense(out). The params adapter asserts this structure and the
agent falls back to the XLA scan for anything it can't map.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LN_EPS = 1e-6  # flax.linen.LayerNorm default


def flatten_mlp_diffusion_params(params: Any) -> list[jnp.ndarray]:
    """MLPDiffusion param pytree → flat list of *transposed* kernel weights.

    Raises KeyError/AssertionError if the structure is not the default
    MLPDiffusion topology (callers catch and fall back to the XLA sampler).
    """
    ff = params["FourierFeatures_0"]["kernel"]            # (time_dim/2, 1)
    assert ff.shape[-1] == 1, "fused IDM sampler expects scalar time input"
    cond = params["MLP_0"]
    trunk = params["MLPResNet_0"]
    wT = lambda d: d["kernel"].T                          # (out, in)
    col = lambda d: d["bias"][:, None]                    # (out, 1)
    out = [ff,
           wT(cond["Dense_0"]), col(cond["Dense_0"]),
           wT(cond["Dense_1"]), col(cond["Dense_1"]),
           wT(trunk["Dense_0"]), col(trunk["Dense_0"])]
    n_blocks = 0
    while f"MLPResNetBlock_{n_blocks}" in trunk:
        blk = trunk[f"MLPResNetBlock_{n_blocks}"]
        assert "Dense_2" not in blk, "projection blocks unsupported"
        out += [blk["LayerNorm_0"]["scale"][:, None],
                blk["LayerNorm_0"]["bias"][:, None],
                wT(blk["Dense_0"]), col(blk["Dense_0"]),
                wT(blk["Dense_1"]), col(blk["Dense_1"])]
        n_blocks += 1
    assert n_blocks > 0
    out += [wT(trunk["Dense_1"]), col(trunk["Dense_1"])]
    return [jnp.asarray(x, jnp.float32) for x in out]


def _sampler_kernel(n_blocks: int, n_steps: int, clip_range: float,
                    ts_ref, coef_ref,
                    # network weights (VMEM, full, transposed):
                    ff, c_w0, c_b0, c_w1, c_b1, t_w0, t_b0,
                    *rest):
    blk_refs = rest[:6 * n_blocks]
    o_w, o_b, s_ref, x0_ref, noise_ref, out_ref = rest[6 * n_blocks:]

    s = s_ref[:]                                          # (S, TILE)
    tile = s.shape[-1]

    def mm(a, b):
        return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    def eval_net(x, step):
        # time features: scalar t -> (time_dim, 1) -> cond MLP -> broadcast
        t = ts_ref[step].astype(jnp.float32)
        f = (2.0 * jnp.pi * t) * ff[:]                    # (time_dim/2, 1)
        tff = jnp.concatenate([jnp.cos(f), jnp.sin(f)], axis=0)
        c = mm(c_w0[:], tff) + c_b0[:]
        c = c * jax.nn.sigmoid(c)                         # swish
        c = mm(c_w1[:], c) + c_b1[:]                      # (C, 1)
        cond = jnp.broadcast_to(c, (c.shape[0], tile))

        h = jnp.concatenate([x, s, cond], axis=0)         # (A+S+C, TILE)
        h = mm(t_w0[:], h) + t_b0[:]
        for i in range(n_blocks):
            ln_s, ln_b, w0, b0, w1, b1 = blk_refs[6 * i:6 * i + 6]
            mu = jnp.mean(h, axis=0, keepdims=True)
            var = jnp.mean(jnp.square(h - mu), axis=0, keepdims=True)
            ln = (h - mu) * jax.lax.rsqrt(var + LN_EPS) * ln_s[:] + ln_b[:]
            hh = jnp.maximum(mm(w0[:], ln) + b0[:], 0.0)
            hh = mm(w1[:], hh) + b1[:]
            h = h + hh
        h = jnp.maximum(h, 0.0)
        return mm(o_w[:], h) + o_b[:]                     # (A, TILE) epsilon

    def body(step, x):
        eps = eval_net(x, step)
        x0 = jnp.clip(coef_ref[step, 0] * (x - coef_ref[step, 1] * eps),
                      -clip_range, clip_range)
        return (coef_ref[step, 2] * x0 + coef_ref[step, 3] * x
                + coef_ref[step, 4] * noise_ref[step])

    out_ref[:] = jax.lax.fori_loop(0, n_steps, body, x0_ref[:])


def fused_mlp_diffusion_sample(params: Any, s: jnp.ndarray, x_init: jnp.ndarray,
                               timesteps: jnp.ndarray, coefs: jnp.ndarray,
                               noise: jnp.ndarray, *, clip_range: float = 1.0,
                               tile: int = 1024,
                               interpret: bool = False) -> jnp.ndarray:
    """Run the full reverse process for a batch of conditions.

    s: (N, S) condition; x_init: (N, A) initial gaussian sample;
    timesteps: (T,) int32 descending; coefs: (T, 5) from ops.diffusion
    *_coef_table; noise: (T, N, A) per-step DDPM noise (zeros for DDIM).
    Returns (N, A) float32 samples.
    """
    flat = flatten_mlp_diffusion_params(params)
    n_blocks = (len(flat) - 9) // 6
    N, A = x_init.shape
    S = s.shape[1]
    T = int(timesteps.shape[0])
    tile = min(tile, N)
    assert N % tile == 0, f"batch {N} not divisible by tile {tile}"
    grid = (N // tile,)

    w_specs = [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in flat]
    kernel = functools.partial(_sampler_kernel, n_blocks, T, clip_range)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),            # timesteps
            pl.BlockSpec(memory_space=pltpu.SMEM),            # coefs
            *w_specs,
            pl.BlockSpec((S, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),            # s^T
            pl.BlockSpec((A, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),            # x_init^T
            pl.BlockSpec((T, A, tile), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),            # noise^T
        ],
        out_specs=pl.BlockSpec((A, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((A, N), jnp.float32),
        interpret=interpret,
    )(jnp.asarray(timesteps, jnp.int32), jnp.asarray(coefs, jnp.float32),
      *flat, s.astype(jnp.float32).T, x_init.astype(jnp.float32).T,
      jnp.swapaxes(noise.astype(jnp.float32), 1, 2))
    return out.T
