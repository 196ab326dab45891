#!/usr/bin/env python
"""Microbenchmark the VAE encoder — the round-1 rollout bottleneck.

Round-1 finding (RESULTS.md): the per-decision VAE encode of 1024 64x64
frames is ~97% of fused-rollout wall time (~490 ms per call, ~25 TFLOPS
effective) and is invariant to compute dtype. This script isolates where
that time goes: full encoder vs conv-only vs norm-only vs one hot conv,
in bf16 and fp32, so the fix (Pallas kernel / layout change / smaller
stem) targets the real cost.
"""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

import sys
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def timeit(fn, *args, iters=5):
    out = fn(*args)
    jax.block_until_ready(out)  # compile + warmup
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=1024)
    p.add_argument("--iters", type=int, default=5)
    args = p.parse_args()

    from latent_diffusion_planning_tpu.models.vae import KLVAE, Encoder
    import flax.linen as nn

    B = args.batch
    rng = jax.random.PRNGKey(0)
    img = jax.random.normal(rng, (B, 64, 64, 3), jnp.float32)

    results = {}

    # --- A/B: full encoder, bf16 vs fp32 ---------------------------------
    for dt_name, dt in (("bf16", jnp.bfloat16), ("fp32", jnp.float32)):
        enc = Encoder(block_out_channels=(128, 256, 256, 256, 256, 256),
                      latent_channels=4, compute_dtype=dt)
        params = enc.init(rng, img[:2])["params"]
        f = jax.jit(lambda p, x: enc.apply({"params": p}, x)[0])
        t = timeit(f, params, img, iters=args.iters)
        results[f"full_encoder_{dt_name}"] = t
        print(f"full_encoder_{dt_name}: {t*1e3:.1f} ms "
              f"({12.3e12*B/1024/t/1e12:.1f} TFLOPS est)", flush=True)

    # --- C: conv-only stack (same conv shapes, no norms/act) -------------
    class ConvOnly(nn.Module):
        dt: object
        @nn.compact
        def __call__(self, x):
            dt = self.dt
            x = x.astype(dt)
            chans = (128, 256, 256, 256, 256, 256)
            x = nn.Conv(chans[0], (3, 3), padding=1, dtype=dt,
                        param_dtype=jnp.float32)(x)
            for i, ch in enumerate(chans):
                for _ in range(4):  # 2 resblocks x 2 convs
                    x = nn.Conv(ch, (3, 3), padding=1, dtype=dt,
                                param_dtype=jnp.float32)(x)
                if i < len(chans) - 1:
                    x = nn.Conv(ch, (3, 3), strides=(2, 2), padding=1,
                                dtype=dt, param_dtype=jnp.float32)(x)
            for _ in range(4):  # 2 mid resblocks
                x = nn.Conv(chans[-1], (3, 3), padding=1, dtype=dt,
                            param_dtype=jnp.float32)(x)
            return x

    for dt_name, dt in (("bf16", jnp.bfloat16), ("fp32", jnp.float32)):
        m = ConvOnly(dt)
        params = m.init(rng, img[:2])["params"]
        f = jax.jit(lambda p, x: m.apply({"params": p}, x))
        t = timeit(f, params, img, iters=args.iters)
        results[f"conv_only_{dt_name}"] = t
        print(f"conv_only_{dt_name}: {t*1e3:.1f} ms", flush=True)

    # --- D: norm+silu-only stack ------------------------------------------
    class NormOnly(nn.Module):
        dt: object
        @nn.compact
        def __call__(self, x):
            x = jnp.tile(x, (1, 1, 1, 43))[..., :128].astype(self.dt)
            # 64x64x128 x ~5 norms then 32x32x256 etc (approx the encoder's)
            for _ in range(5):
                x = nn.silu(nn.GroupNorm(num_groups=32, dtype=self.dt)(x))
            return x

    for dt_name, dt in (("bf16", jnp.bfloat16), ("fp32", jnp.float32)):
        m = NormOnly(dt)
        params = m.init(rng, img[:2])["params"]
        f = jax.jit(lambda p, x: m.apply({"params": p}, x))
        t = timeit(f, params, img, iters=args.iters)
        results[f"norm5_64x64x128_{dt_name}"] = t
        print(f"norm5_64x64x128_{dt_name}: {t*1e3:.1f} ms", flush=True)

    # --- E: single hot conv 128->128 @ 64x64 ------------------------------
    for dt_name, dt in (("bf16", jnp.bfloat16), ("fp32", jnp.float32)):
        x = jax.random.normal(rng, (B, 64, 64, 128), dt)
        w = jax.random.normal(rng, (3, 3, 128, 128), dt)
        f = jax.jit(lambda x, w: jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32))
        t = timeit(f, x, w, iters=args.iters)
        flops = 2 * B * 64 * 64 * 128 * 128 * 9
        results[f"conv128_{dt_name}"] = t
        print(f"one conv 128x128@64x64 {dt_name}: {t*1e3:.2f} ms "
              f"= {flops/t/1e12:.1f} TFLOPS", flush=True)

    # --- F: equivalent matmul (what the MXU can actually do) --------------
    for dt_name, dt in (("bf16", jnp.bfloat16), ("fp32", jnp.float32)):
        a = jax.random.normal(rng, (B * 64 * 64 // 8, 128 * 9), dt)
        w = jax.random.normal(rng, (128 * 9, 128), dt)
        f = jax.jit(lambda a, w: a @ w)
        t = timeit(f, a, w, iters=args.iters)
        flops = 2 * a.shape[0] * a.shape[1] * w.shape[1]
        print(f"equiv matmul {dt_name}: {t*1e3:.2f} ms = "
              f"{flops/t/1e12:.1f} TFLOPS", flush=True)

    print({k: round(v * 1e3, 1) for k, v in results.items()})


if __name__ == "__main__":
    main()
