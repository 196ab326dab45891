"""Real-TPU smoke + microbench of the streamed fused U-Net sampler.

The HBM weight-streaming mode exists for nets over the VMEM-resident budget
(reference-scale [256,512,1024] is ~146 MB bf16 — VERDICT r4 weak 5).
Interpret-mode parity is covered by tests/test_pallas_sampler.py; this
script proves the Mosaic lowering on the actual chip *before* the
reference-scale pipeline (tools/run_reference_scale.sh) relies on it:

  1. parity: streamed fused DDIM vs the XLA scan sampler at reference scale
  2. timing: XLA scan vs streamed fused, DDIM-25, B=64 x T=16

Usage: python tools/smoke_streamed_sampler.py  (takes the chip for ~2 min)
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from latent_diffusion_planning_tpu.models.nets.unet1d import ConditionalUnet1D
from latent_diffusion_planning_tpu.ops import diffusion as dlib
from latent_diffusion_planning_tpu.ops.pallas import diffusion_unet1d as punet


def main():
    print("backend:", jax.default_backend(), jax.devices())
    B, T, D, Dc = 64, 16, 7, 526
    DD = (256, 512, 1024)
    net = ConditionalUnet1D(input_dim=D, down_dims=DD)
    rng = jax.random.PRNGKey(0)
    params = net.init(rng, jnp.zeros((2, T, D)), jnp.zeros((2,), jnp.int32),
                      jnp.zeros((2, Dc)))["params"]
    wb = punet.unet1d_vmem_bytes(params, DD, jnp.bfloat16)
    print(f"weights: {wb / 1e6:.0f} MB bf16 "
          f"(budget {punet.WEIGHT_VMEM_BUDGET / 1e6:.0f} MB -> streamed)")
    assert wb > punet.WEIGHT_VMEM_BUDGET
    gcond = jax.random.normal(rng, (B, Dc))
    sched = dlib.DiffusionSchedule.create(100, "squaredcos_cap_v2")
    n_inf = 25
    ts, coefs = dlib.ddim_coef_table(sched, n_inf)
    key = jax.random.PRNGKey(7)
    _, init_rng = jax.random.split(key)
    x0 = jax.random.normal(init_rng, (B, T, D), jnp.float32)

    def denoise(x, t):
        return net.apply({"params": params}, x, t, gcond)

    @jax.jit
    def run_xla():
        return dlib.sample_ddim(sched, denoise, key, (B, T, D), n_inf)

    @jax.jit
    def run_streamed():
        return punet.fused_unet1d_ddim_sample(
            params, gcond, x0, ts, coefs, down_dims=DD, dtype=jnp.bfloat16,
            batch_tile=B, streaming=True)

    def timed(f, name):
        out = jax.block_until_ready(f())          # compile
        t0 = time.perf_counter()
        n = 10
        for _ in range(n):
            out = jax.block_until_ready(f())
        dt = (time.perf_counter() - t0) / n * 1e3
        print(f"{name}: {dt:.2f} ms / plan ({n} reps)")
        return np.asarray(out), dt

    ref, t_xla = timed(run_xla, "XLA scan DDIM-25      ")
    got, t_str = timed(run_streamed, "streamed fused DDIM-25")
    # bf16 kernel weights vs f32 XLA: tolerance is bf16 matmul scale
    err = np.abs(got - ref).max()
    print(f"max|streamed - xla| = {err:.4f} (bf16 vs f32 weights)")
    assert np.isfinite(got).all()
    assert err < 0.15, err
    print(f"OK speedup {t_xla / t_str:.2f}x")


if __name__ == "__main__":
    main()
