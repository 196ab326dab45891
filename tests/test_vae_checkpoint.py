"""VAE model + checkpoint round-trip tests."""

import jax
import jax.numpy as jnp
import numpy as np

from latent_diffusion_planning_tpu.models.vae import (KLVAE, VAEModel,
                                                      kl_divergence,
                                                      latent_grid_shape)
from latent_diffusion_planning_tpu.train.checkpoint import (
    Checkpointer, apply_params_snapshot)

STATS = {
    "obs": {"agentview_image": {"min": 0, "max": 255}},
    "actions": {"clip_min": -1, "clip_max": 1},
}


def _batch(B=2, H=2, size=16, key=0):
    rng = np.random.default_rng(key)
    return {
        "obs": {"agentview_image": jnp.asarray(
            rng.integers(0, 256, size=(B, H, size, size, 3)), jnp.uint8)},
        "actions": jnp.zeros((B, H, 2)),
    }


def _model():
    return VAEModel.create(
        jax.random.PRNGKey(0), _batch(),
        vae={"block_out_channels": [8, 8, 8], "norm_groups": 4,
             "latent_channels": 1, "use_mid_attention": False},
        rgb_obs=["agentview_image"], obs_normalization=STATS,
        beta=1e-5, lr=1e-3, warmup_steps=2, decay_steps=50, image_size=16)


def test_vae_shapes_and_kl():
    vae = KLVAE(block_out_channels=(8, 8, 8), norm_groups=4,
                latent_channels=2, use_mid_attention=True)
    x = jnp.zeros((2, 16, 16, 3))
    params = vae.init(jax.random.PRNGKey(0), x, jax.random.PRNGKey(1))["params"]
    rec, mean, logvar = vae.apply({"params": params}, x, jax.random.PRNGKey(2))
    assert rec.shape == (2, 16, 16, 3)
    assert mean.shape == (2, 4, 4, 2)  # two downsamples
    kl = kl_divergence(mean, logvar)
    assert kl.shape == (2,) and np.all(np.asarray(kl) >= 0)


def test_latent_grid_shapes():
    assert latent_grid_shape(16) == (2, 2, 4)
    assert latent_grid_shape(36) == (3, 3, 4)


def test_vae_model_update_reduces_loss():
    model = _model()
    batch = _batch(key=1)
    rng = jax.random.PRNGKey(1)
    losses = []
    for i in range(25):
        rng, sub = jax.random.split(rng)
        model, metrics = model.update(batch, sub)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses
    assert int(model.vae_state.step) == 25
    # ema params differ from raw after updates
    d = jax.tree_util.tree_map(lambda a, b: float(jnp.abs(a - b).max()),
                               model.vae_state.params,
                               model.vae_state.ema_params)
    assert max(jax.tree_util.tree_leaves(d)) > 0


def test_vae_reconstruct_and_sample():
    model = _model()
    batch = _batch(key=2)
    rec = model.reconstruct(batch)
    assert rec.shape == (2, 16, 16, 3)
    assert float(jnp.min(rec)) >= 0 and float(jnp.max(rec)) <= 255
    samples = model.sample(jax.random.PRNGKey(3), 4)
    assert samples.shape == (4, 16, 16, 3)


def test_checkpoint_full_state_roundtrip(tmp_path):
    model = _model()
    batch = _batch(key=3)
    model, _ = model.update(batch, jax.random.PRNGKey(0))
    ckpt = Checkpointer(tmp_path / "ckpt")
    ckpt.save_state(1, model, config={"a": 1})
    assert ckpt.list_states() == [tmp_path / "ckpt" / "1.state"]

    fresh = _model()
    restored = ckpt.restore_state(tmp_path / "ckpt" / "1.state", fresh)
    assert int(restored.vae_state.step) == 1
    np.testing.assert_allclose(
        np.asarray(jax.tree_util.tree_leaves(restored.vae_state.params)[0]),
        np.asarray(jax.tree_util.tree_leaves(model.vae_state.params)[0]))
    # optimizer state restored too (true resume)
    r_leaf = jax.tree_util.tree_leaves(restored.vae_state.opt_state)[0]
    m_leaf = jax.tree_util.tree_leaves(model.vae_state.opt_state)[0]
    np.testing.assert_allclose(np.asarray(r_leaf), np.asarray(m_leaf))


def test_params_snapshot_roundtrip(tmp_path):
    model = _model()
    batch = _batch(key=4)
    model, _ = model.update(batch, jax.random.PRNGKey(0))
    ckpt = Checkpointer(tmp_path / "ckpt")
    ckpt.save_params(7, model.get_params())
    assert (tmp_path / "ckpt" / "7.ckpt").exists()
    snap = ckpt.restore_raw(tmp_path / "ckpt" / "7.ckpt")
    assert "vae_params" in snap and "vae_ema_params" in snap

    fresh = _model()
    loaded = apply_params_snapshot(fresh, snap)
    np.testing.assert_allclose(
        np.asarray(jax.tree_util.tree_leaves(loaded.vae_state.params)[0]),
        np.asarray(jax.tree_util.tree_leaves(model.vae_state.params)[0]))


def test_list_checkpoints_sorted(tmp_path):
    ckpt = Checkpointer(tmp_path)
    model = _model()
    for step in (100, 20, 3):
        ckpt.save_params(step, model.get_params())
    names = [p.name for p in ckpt.list_checkpoints()]
    assert names == ["3.ckpt", "20.ckpt", "100.ckpt"]
