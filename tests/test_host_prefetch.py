"""Native C++ window prefetcher vs the jitted device gather (bit-exact)."""

import shutil

import jax
import numpy as np
import pytest

from latent_diffusion_planning_tpu.data.ingest import WeldedDemos
from latent_diffusion_planning_tpu.data.windows import DeviceDataset

pytestmark = pytest.mark.skipif(shutil.which("g++") is None,
                                reason="no C++ toolchain")


def _welded(n_demos=3, lengths=(7, 5, 9)):
    rng = np.random.default_rng(0)
    total = sum(lengths)
    arrays = {
        "robot0_eef_pos": rng.normal(size=(total, 3)).astype(np.float32),
        "agentview_image": rng.integers(0, 255, (total, 8, 8, 3), np.uint8),
        "actions": rng.uniform(-1, 1, (total, 7)).astype(np.float32),
    }
    starts = np.cumsum([0] + list(lengths[:-1]))
    return WeldedDemos(arrays=arrays, demo_starts=np.asarray(starts),
                       demo_lengths=np.asarray(lengths),
                       obs_keys=("robot0_eef_pos", "agentview_image"),
                       dataset_keys=("actions",))


def test_native_matches_jitted_gather():
    from latent_diffusion_planning_tpu.data.host_prefetch import HostPrefetcher

    welded = _welded()
    fs, sl, B = 2, 4, 16
    pf = HostPrefetcher(welded, frame_stack=fs, seq_length=sl, batch_size=B,
                        n_slots=3, n_threads=2, seed=7)
    dd = DeviceDataset.from_welded(welded, frame_stack=fs, seq_length=sl,
                                   device_put=False)
    try:
        for _ in range(5):
            batch, idx = pf.next_batch(return_indices=True)
            assert (idx >= 0).all() and (idx < welded.total_steps).all()
            ref = jax.device_get(dd.gather(np.asarray(idx, np.int32)))
            for k in welded.obs_keys:
                np.testing.assert_array_equal(batch["obs"][k], ref["obs"][k],
                                              err_msg=k)
            np.testing.assert_array_equal(batch["actions"], ref["actions"])
    finally:
        pf.close()


def test_deterministic_given_seed():
    from latent_diffusion_planning_tpu.data.host_prefetch import HostPrefetcher

    welded = _welded()

    def first_idx(seed):
        pf = HostPrefetcher(welded, frame_stack=1, seq_length=3, batch_size=8,
                            n_slots=1, n_threads=1, seed=seed)
        try:
            _, idx = pf.next_batch(return_indices=True)
            return idx
        finally:
            pf.close()

    np.testing.assert_array_equal(first_idx(3), first_idx(3))
    assert not np.array_equal(first_idx(3), first_idx(4))


def test_memmapped_shards(tmp_path):
    """Beyond-RAM capability: arrays arrive as np.memmap and stream through."""
    from latent_diffusion_planning_tpu.data.host_prefetch import HostPrefetcher

    welded = _welded()
    mapped = {}
    for k, v in welded.arrays.items():
        f = tmp_path / f"{k}.npy"
        np.save(f, v)
        mapped[k] = np.load(f, mmap_mode="r")
    welded_m = WeldedDemos(arrays=mapped, demo_starts=welded.demo_starts,
                           demo_lengths=welded.demo_lengths,
                           obs_keys=welded.obs_keys,
                           dataset_keys=welded.dataset_keys)
    pf = HostPrefetcher(welded_m, frame_stack=1, seq_length=2, batch_size=4,
                        seed=0)
    try:
        batch = pf.next_batch()
        assert batch["obs"]["agentview_image"].shape == (4, 2, 8, 8, 3)
        assert batch["actions"].dtype == np.float32
    finally:
        pf.close()
