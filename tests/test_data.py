"""Data layer tests: welding, window semantics, mixed sampling, latents."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from latent_diffusion_planning_tpu.data import ingest, synthetic
from latent_diffusion_planning_tpu.data.datasets import (MixedOfflineData,
                                                         OfflineData)
from latent_diffusion_planning_tpu.data.windows import (DeviceDataset,
                                                        MixedDeviceDataset,
                                                        sample_traj)

OBS_SHAPES = {"robot0_eef_pos": (3,), "robot0_gripper_qpos": (2,)}


@pytest.fixture(scope="module")
def h5(tmp_path_factory):
    d = tmp_path_factory.mktemp("data")
    p = synthetic.write_robomimic_hdf5(d / "train.hdf5", n_demos=3,
                                       demo_len=12, obs_shapes=OBS_SHAPES,
                                       ac_dim=4)
    return p


def test_weld_shapes(h5):
    w = ingest.load_robomimic(h5, list(OBS_SHAPES) + ["optimal"])
    # 12 steps + 1 spliced terminal frame per demo
    assert w.total_steps == 3 * 13
    assert w.arrays["robot0_eef_pos"].shape == (39, 3)
    assert w.arrays["actions"].shape == (39, 4)
    assert w.arrays["optimal"].shape == (39, 1)
    np.testing.assert_array_equal(w.demo_starts, [0, 13, 26])
    # terminal obs frame equals last next_obs; dummy action duplicated
    np.testing.assert_array_equal(w.arrays["actions"][12], w.arrays["actions"][11])


def test_weld_demo_cap(h5):
    w = ingest.load_robomimic(h5, list(OBS_SHAPES), n_demos=2)
    assert w.n_demos == 2 and w.total_steps == 26
    w2 = ingest.load_robomimic(h5, list(OBS_SHAPES), n_demos=["demo_2"])
    assert w2.n_demos == 1


def test_window_edges(h5):
    w = ingest.load_robomimic(h5, list(OBS_SHAPES))
    ds = DeviceDataset.from_welded(w, frame_stack=2, seq_length=5)
    # index 0 of demo 0: pad-start should repeat frame 0
    batch = ds.gather(jnp.array([0]))
    obs = np.asarray(batch["obs"]["robot0_eef_pos"])  # (1, 2-1+5, 3)
    assert obs.shape == (1, 6, 3)
    np.testing.assert_array_equal(obs[0, 0], obs[0, 1])  # clamped start
    # actions drop the stacked prefix
    assert batch["actions"].shape == (1, 5, 4)

    # last index of demo 0 (idx 12): pad-end repeats final frame
    batch = ds.gather(jnp.array([12]))
    obs = np.asarray(batch["obs"]["robot0_eef_pos"])
    np.testing.assert_array_equal(obs[0, -1], obs[0, -2])
    # window must not cross into demo 1
    np.testing.assert_array_equal(
        obs[0, -1], np.asarray(w.arrays["robot0_eef_pos"][12]))


def test_window_matches_reference_semantics(h5):
    """Windows equal the explicit pad-then-slice construction."""
    w = ingest.load_robomimic(h5, list(OBS_SHAPES))
    fs, sl = 3, 4
    ds = DeviceDataset.from_welded(w, frame_stack=fs, seq_length=sl)
    key = "robot0_eef_pos"
    for idx in [0, 1, 5, 11, 12, 13, 25, 38]:
        got = np.asarray(ds.gather(jnp.array([idx]))["obs"][key])[0]
        # reference: slice demo, pad edges explicitly
        demo_start = (idx // 13) * 13
        demo_end = demo_start + 13
        s = max(idx - fs + 1, demo_start)
        e = min(idx + sl, demo_end)
        seq = w.arrays[key][s:e]
        n_pad_start = max(fs - (idx - s + 1), 0)
        n_pad_end = max(sl - (e - idx), 0)
        seq = np.concatenate([seq[:1]] * n_pad_start + [seq]
                             + [seq[-1:]] * n_pad_end, axis=0)
        np.testing.assert_array_equal(got, seq, err_msg=f"idx={idx}")


def test_sample_jit_and_shapes(h5):
    w = ingest.load_robomimic(h5, list(OBS_SHAPES))
    ds = DeviceDataset.from_welded(w, frame_stack=1, seq_length=9)
    batch = ds.sample(jax.random.PRNGKey(0), 16)
    assert batch["obs"]["robot0_eef_pos"].shape == (16, 9, 3)
    assert batch["actions"].shape == (16, 9, 4)


def test_mixed_sampling_probabilities(h5, tmp_path):
    p2 = synthetic.write_robomimic_hdf5(tmp_path / "sub.hdf5", n_demos=2,
                                        demo_len=12, obs_shapes=OBS_SHAPES,
                                        ac_dim=4, seed=7)
    w1 = ingest.load_robomimic(h5, list(OBS_SHAPES) + ["optimal"], optimal=1.0)
    w2 = ingest.load_robomimic(p2, list(OBS_SHAPES) + ["optimal"], optimal=0.0)
    cat = ingest.concat_welded([w1, w2])
    ds = DeviceDataset.from_welded(cat, frame_stack=1, seq_length=2)
    mixed = MixedDeviceDataset.create(ds, [0, w1.total_steps],
                                      [w1.total_steps, w2.total_steps],
                                      [0.8, 0.2])
    batch = mixed.sample(jax.random.PRNGKey(1), 512)
    frac_optimal = float(np.asarray(batch["obs"]["optimal"][:, 0, 0]).mean())
    assert 0.7 < frac_optimal < 0.9, frac_optimal


def test_latent_companion(h5, tmp_path):
    lp = synthetic.write_latent_hdf5(tmp_path / "lat.hdf5", h5,
                                     ["agentview_image"], latent_dim=16)
    w = ingest.load_robomimic(h5, ["robot0_eef_pos", "latent_agentview_image"],
                              latent_path=lp)
    assert w.arrays["latent_agentview_image"].shape == (39, 16)


def test_facade(h5):
    meta = {"lowdim_obs": ["robot0_eef_pos"], "rgb_obs": [],
            "shape_meta": {"ac_dim": 4,
                           "all_shapes": {"robot0_eef_pos": [3]}},
            "obs_normalization": synthetic.synthetic_stats(OBS_SHAPES)}
    data = OfflineData(name="syn", train_path=str(h5), eval_path=str(h5),
                       meta=meta, batch_size=8, obs_horizon=2, seq_length=5)
    it = data.train_dataloader()
    batch = next(it)
    assert batch["obs"]["robot0_eef_pos"].shape == (8, 6, 3)
    assert batch["actions"].shape == (8, 5, 4)
    assert data.shape_meta["ac_dim"] == 4
    traj = data.sample_traj("train", 0)
    assert traj["obs"]["robot0_eef_pos"].shape == (13, 1, 3)


def test_uint8_images_roundtrip(tmp_path):
    p = synthetic.write_robomimic_hdf5(
        tmp_path / "img.hdf5", n_demos=1, demo_len=4,
        obs_shapes={"agentview_image": (8, 8, 3)},
        image_keys=["agentview_image"], ac_dim=2)
    w = ingest.load_robomimic(p, ["agentview_image"])
    assert w.arrays["agentview_image"].dtype == np.uint8
    ds = DeviceDataset.from_welded(w, frame_stack=1, seq_length=2)
    batch = ds.sample(jax.random.PRNGKey(0), 4)
    assert batch["obs"]["agentview_image"].dtype == jnp.uint8


def test_stats_from_data_measures_bounds(h5):
    """stats_from_data replaces hand-written normalization bounds with
    per-dim ranges measured from the loaded demos (the reference's measured
    per-task tables, data/cfg/aloha_cube/latent_wrist.yaml:33-50, computed
    instead of transcribed)."""
    meta = {"lowdim_obs": ["robot0_eef_pos"], "rgb_obs": [],
            "shape_meta": {"ac_dim": 4,
                           "all_shapes": {"robot0_eef_pos": [3]}},
            "obs_normalization": synthetic.synthetic_stats(OBS_SHAPES)}
    data = OfflineData(name="syn", train_path=str(h5), eval_path=str(h5),
                       meta=meta, batch_size=8, obs_horizon=1, seq_length=3,
                       stats_from_data=["robot0_eef_pos", "actions"],
                       stats_pad=0.05)
    norm = data.meta["obs_normalization"]
    w = data.welded("train")
    arr = np.asarray(w.arrays["robot0_eef_pos"])
    lo, hi = arr.min(0), arr.max(0)
    span = np.maximum(hi - lo, 1e-4)
    np.testing.assert_allclose(norm["obs"]["robot0_eef_pos"]["min"],
                               lo - 0.05 * span, atol=1e-4)
    np.testing.assert_allclose(norm["obs"]["robot0_eef_pos"]["max"],
                               hi + 0.05 * span, atol=1e-4)
    acts = np.asarray(w.arrays["actions"])
    assert len(norm["actions"]["min"]) == acts.shape[1]
    # the original meta dict is untouched (deep copy)
    assert "min" not in meta["obs_normalization"].get("actions", {})


def test_facade_multi_path_welds(h5, tmp_path):
    """List-valued train_path welds several files (clean + DART segments)."""
    p2 = synthetic.write_robomimic_hdf5(tmp_path / "seg2.hdf5", n_demos=2,
                                        demo_len=9, obs_shapes=OBS_SHAPES,
                                        ac_dim=4, seed=3)
    meta = {"lowdim_obs": ["robot0_eef_pos"], "rgb_obs": [],
            "shape_meta": {"ac_dim": 4,
                           "all_shapes": {"robot0_eef_pos": [3]}},
            "obs_normalization": synthetic.synthetic_stats(OBS_SHAPES)}
    data = OfflineData(name="syn2", train_path=[str(h5), str(p2)],
                       eval_path=str(h5), meta=meta, batch_size=4,
                       seq_length=5, device_put=False)
    w = data.welded("train")
    assert len(w.demo_starts) == 5           # 3 + 2 demos
    assert w.total_steps == 3 * 13 + 2 * 10  # terminal splice per demo
    batch = next(data.train_dataloader())
    assert batch["actions"].shape == (4, 5, 4)


def test_action_event_weights_properties(h5):
    from latent_diffusion_planning_tpu.data.windows import action_event_weights

    w = ingest.load_robomimic(h5, list(OBS_SHAPES))
    # plant one sharp event on channel 2 of demo 1
    w.arrays["actions"][:] = 0.0
    s = int(w.demo_starts[1])
    w.arrays["actions"][s + 6, 2] = 1.0   # step 6: jump up, step 7: jump back
    wts = action_event_weights(w, channels=[2], boost=3.0, halfwidth=2)
    assert wts.shape == (w.total_steps,)
    assert np.all(wts >= 1.0) and np.isclose(wts.max(), 4.0)
    # demo 1 peaks around the event; other demos stay flat at 1
    assert wts[s + 6] == wts.max()
    assert np.allclose(wts[: int(w.demo_lengths[0])], 1.0)


def test_weighted_sampling_skews_draws(h5):
    from latent_diffusion_planning_tpu.data.windows import action_event_weights

    w = ingest.load_robomimic(h5, list(OBS_SHAPES))
    w.arrays["actions"][:] = 0.0
    s = int(w.demo_starts[1])
    w.arrays["actions"][s + 6, 2] = 1.0
    # tag each step so gathered windows reveal their source index
    w.arrays["robot0_eef_pos"][:, 0] = np.arange(w.total_steps)
    wts = action_event_weights(w, channels=[2], boost=9.0, halfwidth=1)
    ds = DeviceDataset.from_welded(w, frame_stack=1, seq_length=1,
                                   sample_weights=wts)
    batch = ds.sample(jax.random.PRNGKey(0), 4096)
    ids = np.asarray(batch["obs"]["robot0_eef_pos"][:, 0, 0]).astype(int)
    near = np.isin(ids, [s + 5, s + 6, s + 7]).mean()
    # 3 boosted steps out of 39: uniform would give ~7.7%; boosted ~40%+
    assert near > 0.25, near
    # uniform control
    ds_u = DeviceDataset.from_welded(w, frame_stack=1, seq_length=1)
    ids_u = np.asarray(ds_u.sample(jax.random.PRNGKey(0), 4096)
                       ["obs"]["robot0_eef_pos"][:, 0, 0]).astype(int)
    assert np.isin(ids_u, [s + 5, s + 6, s + 7]).mean() < 0.15


def test_mixed_step_weights_keep_sub_probabilities(h5, tmp_path):
    p2 = synthetic.write_robomimic_hdf5(tmp_path / "sub_w.hdf5", n_demos=2,
                                        demo_len=12, obs_shapes=OBS_SHAPES,
                                        ac_dim=4, seed=7)
    w1 = ingest.load_robomimic(h5, list(OBS_SHAPES) + ["optimal"], optimal=1.0)
    w2 = ingest.load_robomimic(p2, list(OBS_SHAPES) + ["optimal"], optimal=0.0)
    cat = ingest.concat_welded([w1, w2])
    ds = DeviceDataset.from_welded(cat, frame_stack=1, seq_length=2)
    # arbitrary per-step weights: sub-mixture fractions must be unaffected
    rngw = np.random.default_rng(0)
    wts = rngw.uniform(0.5, 5.0, cat.total_steps).astype(np.float32)
    mixed = MixedDeviceDataset.create(ds, [0, w1.total_steps],
                                      [w1.total_steps, w2.total_steps],
                                      [0.8, 0.2], step_weights=wts)
    batch = mixed.sample(jax.random.PRNGKey(1), 2048)
    frac_optimal = float(np.asarray(batch["obs"]["optimal"][:, 0, 0]).mean())
    assert 0.75 < frac_optimal < 0.85, frac_optimal


def test_facade_oversample_train_only(h5):
    meta = {"lowdim_obs": ["robot0_eef_pos"], "rgb_obs": [],
            "shape_meta": {"ac_dim": 4,
                           "all_shapes": {"robot0_eef_pos": [3]}},
            "obs_normalization": synthetic.synthetic_stats(OBS_SHAPES)}
    data = OfflineData(name="t", train_path=str(h5), eval_path=str(h5),
                       meta=meta, batch_size=8, obs_horizon=1, seq_length=2,
                       oversample={"channels": [0, 1], "boost": 2.0,
                                   "halfwidth": 3})
    assert data.device_dataset("train").sample_logits is not None
    assert data.device_dataset("eval").sample_logits is None
    next(data.train_dataloader())  # smoke: jitted weighted sampling runs
