import jax.numpy as jnp
import numpy as np
import pytest

from latent_diffusion_planning_tpu.ops import normalize as nz


def test_roundtrip_vector_bounds():
    stats = {"x": {"min": jnp.array([-1.0, 0.0]), "max": jnp.array([1.0, 4.0])}}
    val = jnp.array([[0.0, 2.0], [1.0, 4.0]])
    normed = nz.normalize_tree({"x": val}, stats)["x"]
    np.testing.assert_allclose(np.asarray(normed), [[0.0, 0.0], [1.0, 1.0]])
    back = nz.unnormalize_tree({"x": normed}, stats)["x"]
    np.testing.assert_allclose(np.asarray(back), np.asarray(val), atol=1e-6)


def test_scalar_int_bounds_images():
    stats = {"img": {"min": 0, "max": 255}}
    val = jnp.full((2, 4, 4, 3), 255.0)
    normed = nz.normalize_tree({"img": val}, stats)["img"]
    np.testing.assert_allclose(np.asarray(normed), 1.0, atol=1e-6)
    normed0 = nz.normalize_tree({"img": jnp.zeros_like(val)}, stats)["img"]
    np.testing.assert_allclose(np.asarray(normed0), -1.0, atol=1e-6)


def test_broadcast_from_right_multi_leading_dims():
    # stats shape (3,), batch shape (B, T, 3)
    stats = {"x": {"min": jnp.array([0.0, 0.0, 0.0]),
                   "max": jnp.array([2.0, 2.0, 2.0])}}
    val = jnp.ones((5, 7, 3))
    out = nz.normalize_tree({"x": val}, stats)["x"]
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-7)


def test_clip_spec_for_actions():
    stats = {"actions": {"clip_min": -1, "clip_max": 1}}
    out = nz.normalize_tree({"actions": jnp.array([-3.0, 0.5, 3.0])}, stats)
    np.testing.assert_allclose(np.asarray(out["actions"]), [-1.0, 0.5, 1.0])


def test_normalize_batch_structure():
    stats = {
        "obs": {"pos": {"min": jnp.zeros(2), "max": jnp.ones(2) * 2}},
        "actions": {"clip_min": -1, "clip_max": 1},
    }
    batch = {"obs": {"pos": jnp.ones((4, 2))}, "actions": jnp.full((4, 3), 2.0)}
    out = nz.normalize_batch(batch, stats)
    np.testing.assert_allclose(np.asarray(out["obs"]["pos"]), 0.0, atol=1e-7)
    np.testing.assert_allclose(np.asarray(out["actions"]), 1.0)


def test_unnormalize_clips_fp_error():
    stats = {"x": {"min": jnp.zeros(1), "max": jnp.ones(1)}}
    out = nz.unnormalize_tree({"x": jnp.array([[1.0 + 1e-6]])}, stats)["x"]
    assert float(out[0, 0]) <= 1.0


def test_missing_stats_raises():
    with pytest.raises(KeyError):
        nz.normalize_tree({"y": jnp.zeros(2)}, {"x": {"min": 0, "max": 1}})


def test_compute_minmax_stats():
    arrays = {"a": np.array([[1.0, -2.0], [3.0, 0.0]])}
    stats = nz.compute_minmax_stats(arrays)
    np.testing.assert_allclose(stats["a"]["min"], [1.0, -2.0])
    np.testing.assert_allclose(stats["a"]["max"], [3.0, 0.0])
    adj = nz.compute_minmax_stats(arrays, margin=0.1)
    np.testing.assert_allclose(adj["a"]["min"], [0.9, -2.2])
    np.testing.assert_allclose(adj["a"]["max"], [3.3, 0.0])


def test_stats_to_arrays():
    cfg = {"obs": {"pos": {"min": [0, 1], "max": [2, 3]}, "img": {"min": 0, "max": 255}}}
    out = nz.stats_to_arrays(cfg)
    assert isinstance(out["obs"]["pos"]["min"], jnp.ndarray)
    assert out["obs"]["img"]["min"] == 0  # scalar stays python
