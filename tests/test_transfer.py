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


def test_diffusers_vae_mapping_round_trip():
    """diffusers-naming round trip covers every KLVAE parameter and the
    mapped VAE reproduces the original reconstruction exactly."""
    bocs = (8, 16, 16)
    vae = KLVAE(block_out_channels=bocs, norm_groups=4,
                downsample_pad="diffusers")
    rng = jax.random.PRNGKey(0)
    img = jax.random.normal(rng, (2, 16, 16, 3))
    params = vae.init(rng, img, jax.random.PRNGKey(1))["params"]

    diffusers_tree = transfer.export_diffusers_vae_params(params, bocs)
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


def test_unet_export_import_round_trip(golden):
    """export_unet1d_params is the exact inverse of map_unet1d_params."""
    _, ref_unet, ref_idm = golden
    ours = transfer.map_unet1d_params(ref_unet, (8, 16))
    back = transfer.export_unet1d_params(ours, (8, 16))
    ref_flat, back_flat = transfer._flat(ref_unet), transfer._flat(back)
    assert set(ref_flat) == set(back_flat)
    for k in ref_flat:
        np.testing.assert_array_equal(np.asarray(ref_flat[k]),
                                      np.asarray(back_flat[k]), err_msg=k)


def test_export_tool_round_trip(tmp_path, golden):
    """tools/export_reference_ckpt.py -> import_reference_ckpt.py is the
    identity on agent snapshots (the round-trip protocol of VERDICT r3 #6)."""
    import sys
    sys.path.insert(0, str(Path(__file__).parent.parent / "tools"))
    import export_reference_ckpt as exp_tool
    import import_reference_ckpt as imp_tool

    _, ref_unet, ref_idm = golden
    ours = {"planner_params": transfer.map_unet1d_params(ref_unet, (8, 16)),
            "idm_params": transfer.map_mlp_diffusion_params(ref_idm),
            "cfg": {"ignored": 1}}
    exported = exp_tool.export(ours, (8, 16))
    assert "ConditionalResidualBlock1D_0" in exported["planner_params"]
    back = imp_tool.convert(exported, (8, 16), (8, 16, 16))
    a, b = transfer._flat(ours["planner_params"]), transfer._flat(back["planner_params"])
    assert set(a) == set(b)
    for k in a:
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]),
                                      err_msg=k)
    np.testing.assert_array_equal(
        np.asarray(transfer._flat(ours["idm_params"])["MLP_0/Dense_0/kernel"]),
        np.asarray(transfer._flat(back["idm_params"])["MLP_0/Dense_0/kernel"]))
