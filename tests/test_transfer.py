"""Reference-checkpoint transfer: golden-activation and round-trip tests.

tests/fixtures/transfer_golden.npz was recorded by running the ACTUAL
reference networks (networks/diffusion_nets_v2.ConditionalUnet1D and
networks/mlp_diffusion_nets.MLPDiffusion at the reference ldp_agent.yaml
recipe: mish cond MLP, non-learnable Fourier time features, layer-normed relu
trunk) on random params + inputs. These tests map those recorded reference
params through train/transfer.py and assert OUR modules reproduce the
reference outputs — i.e. reference-trained planner/IDM weights are usable
here bit-near-exactly.
"""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from latent_diffusion_planning_tpu.models.nets.mlp import MLPDiffusion
from latent_diffusion_planning_tpu.models.nets.unet1d import ConditionalUnet1D
from latent_diffusion_planning_tpu.models.vae import KLVAE
from latent_diffusion_planning_tpu.train import transfer

FIXTURE = Path(__file__).parent / "fixtures" / "transfer_golden.npz"


@pytest.fixture(scope="module")
def golden():
    data = np.load(FIXTURE)
    unet, idm = {}, {}
    for key in data.files:
        if key.startswith("unet:"):
            unet[key[5:]] = data[key]
        elif key.startswith("idm:"):
            idm[key[4:]] = data[key]
    return data, transfer._unflat(unet), transfer._unflat(idm)


@pytest.fixture(autouse=True)
def _precise_matmul():
    with jax.default_matmul_precision("highest"):
        yield


def test_unet_params_transfer_bit_exact(golden):
    data, ref_params, _ = golden
    net = ConditionalUnet1D(input_dim=5, global_cond_dim=6, down_dims=(8, 16),
                            kernel_size=5, n_groups=8)
    mapped = transfer.map_unet1d_params(ref_params, (8, 16))
    out = net.apply({"params": mapped}, jnp.asarray(data["x"]),
                    jnp.asarray(data["t"]), jnp.asarray(data["g"]))
    np.testing.assert_allclose(np.asarray(out), data["unet_out"], atol=2e-5)


def test_idm_params_transfer_bit_exact(golden):
    data, _, ref_params = golden
    net = MLPDiffusion(out_dim=7, time_dim=16, cond_hidden_dims=(32, 32),
                       cond_activation="mish", n_blocks=2, hidden_dim=32,
                       use_layer_norm=True, learnable_time=False)
    mapped = transfer.map_mlp_diffusion_params(ref_params)
    out = net.apply({"params": mapped}, jnp.asarray(data["s"]),
                    jnp.asarray(data["a"]), jnp.asarray(data["tt"]))
    np.testing.assert_allclose(np.asarray(out), data["idm_out"], atol=2e-5)


def _invert_vae_mapping(our_params, block_out_channels, layers_per_block=2):
    """Build a diffusers-style pytree from KLVAE params (test double for the
    real FlaxAutoencoderKL checkpoints — diffusers is not in this image)."""
    L = len(block_out_channels)
    flat = transfer._flat(our_params)
    inv = {}

    def take(src, dst):
        for sfx in ("kernel", "bias", "scale"):
            k = f"{src}/{sfx}"
            if k in flat:
                inv[f"{dst}/{sfx}"] = flat[k]

    def resblock(src, dst):
        take(f"{src}/GroupNorm_0", f"{dst}/norm1")
        take(f"{src}/Conv_0", f"{dst}/conv1")
        take(f"{src}/GroupNorm_1", f"{dst}/norm2")
        take(f"{src}/Conv_1", f"{dst}/conv2")
        take(f"{src}/shortcut", f"{dst}/conv_shortcut")

    def attn(src, dst):
        take(f"{src}/GroupNorm_0", f"{dst}/group_norm")
        for i, name in enumerate(("query", "key", "value", "proj_attn")):
            take(f"{src}/Dense_{i}", f"{dst}/{name}")

    take("encoder/Conv_0", "encoder/conv_in")
    blk = 0
    for i in range(L):
        for j in range(layers_per_block):
            resblock(f"encoder/ResBlock2D_{blk}",
                     f"encoder/down_blocks_{i}/resnets_{j}")
            blk += 1
        if i < L - 1:
            take(f"encoder/Conv_{i + 1}",
                 f"encoder/down_blocks_{i}/downsamplers_0/conv")
    resblock(f"encoder/ResBlock2D_{blk}", "encoder/mid_block/resnets_0")
    attn("encoder/MidAttention_0", "encoder/mid_block/attentions_0")
    resblock(f"encoder/ResBlock2D_{blk + 1}", "encoder/mid_block/resnets_1")
    take("encoder/GroupNorm_0", "encoder/conv_norm_out")
    take(f"encoder/Conv_{L}", "encoder/conv_out")
    take("encoder/quant_conv", "quant_conv")
    take("decoder/post_quant_conv", "post_quant_conv")
    take("decoder/Conv_0", "decoder/conv_in")
    resblock("decoder/ResBlock2D_0", "decoder/mid_block/resnets_0")
    attn("decoder/MidAttention_0", "decoder/mid_block/attentions_0")
    resblock("decoder/ResBlock2D_1", "decoder/mid_block/resnets_1")
    blk = 2
    for i in range(L):
        for j in range(layers_per_block + 1):
            resblock(f"decoder/ResBlock2D_{blk}",
                     f"decoder/up_blocks_{i}/resnets_{j}")
            blk += 1
        if i < L - 1:
            take(f"decoder/Conv_{i + 1}",
                 f"decoder/up_blocks_{i}/upsamplers_0/conv")
    take("decoder/GroupNorm_0", "decoder/conv_norm_out")
    take(f"decoder/Conv_{L}", "decoder/conv_out")
    return transfer._unflat(inv)


def test_diffusers_vae_mapping_round_trip():
    """diffusers-naming round trip covers every KLVAE parameter and the
    mapped VAE reproduces the original reconstruction exactly."""
    bocs = (8, 16, 16)
    vae = KLVAE(block_out_channels=bocs, norm_groups=4,
                downsample_pad="diffusers")
    rng = jax.random.PRNGKey(0)
    img = jax.random.normal(rng, (2, 16, 16, 3))
    params = vae.init(rng, img, jax.random.PRNGKey(1))["params"]

    diffusers_tree = _invert_vae_mapping(params, bocs)
    mapped = transfer.map_diffusers_vae_params(diffusers_tree, bocs)

    ref_flat = transfer._flat(params)
    got_flat = transfer._flat(mapped)
    assert set(ref_flat) == set(got_flat), (
        set(ref_flat) ^ set(got_flat))
    for k in ref_flat:
        np.testing.assert_array_equal(np.asarray(ref_flat[k]),
                                      np.asarray(got_flat[k]), err_msg=k)

    rec0, m0, _ = vae.apply({"params": params}, img)
    rec1, m1, _ = vae.apply({"params": mapped}, img)
    np.testing.assert_array_equal(np.asarray(rec0), np.asarray(rec1))


def test_import_tool_agent_snapshot(tmp_path, golden):
    """tools/import_reference_ckpt.py converts a reference-style agent
    snapshot into the framework's restore protocol."""
    import sys
    sys.path.insert(0, str(Path(__file__).parent.parent / "tools"))
    import import_reference_ckpt as tool

    _, ref_unet, ref_idm = golden
    snapshot = {"planner_params": ref_unet, "idm_params": ref_idm,
                "cfg": {"ignored": 1}}
    out = tool.convert(snapshot, (8, 16), (8, 16, 16))
    assert set(out) == {"planner_params", "idm_params"}
    assert "FiLMResBlock1D_0" in out["planner_params"]
    assert "MLPResNet_0" in out["idm_params"]
