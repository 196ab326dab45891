"""ALOHA 5-camera observation parity (VERDICT r3 missing #6).

The reference's `get_observation` renders top/angle/front_close at 480×640
plus left_pillar and wrist64 at 64×64 (alohasim_env.py:102-114). Here the
same set is selected via the envs' ``camera_names`` surface; static cameras
render at their reference resolutions (envs/aloha_base.STATIC_CAMERAS).
"""

import jax
import numpy as np
import pytest

from latent_diffusion_planning_tpu.envs import aloha_base as B
from latent_diffusion_planning_tpu.envs.aloha_cube import AlohaTransferCubeEnv

pytestmark = pytest.mark.slow  # 480x640 CPU raycasts are compile/FLOP heavy

REFERENCE_SET = ("top", "angle", "front_close", "left_pillar", "wrist64")


def test_static_camera_resolutions():
    for name in ("top", "angle", "front_close"):
        assert B.STATIC_CAMERAS[name][3] == (480, 640)
    assert B.STATIC_CAMERAS["left_pillar"][3] == (64, 64)


def test_recorded_demos_carry_reference_camera_set(tmp_path, monkeypatch):
    """Demo HDF5s record all five reference cameras, each at its own
    resolution, stored uint8 (reference recorded-dataset parity,
    alohasim_env.py:102-114 / aloha_env_utils.py:283-295).

    The static cameras are monkeypatched to tiny resolutions: full-res
    480x640 render quality is covered by test_five_camera_observation_set;
    this test is about the collection->writer plumbing (per-camera shapes,
    dtype, obs/next_obs alignment)."""
    from latent_diffusion_planning_tpu.data.writer import write_trajectories
    from latent_diffusion_planning_tpu.rollout import engine

    small = dict(B.STATIC_CAMERAS)
    for name in ("top", "angle", "front_close"):
        pos, lookat, fovy, _ = small[name]
        small[name] = (pos, lookat, fovy, (12, 16))
    monkeypatch.setattr(B, "STATIC_CAMERAS", small)

    env = AlohaTransferCubeEnv(camera_names=REFERENCE_SET, image_size=16,
                               episode_len=4)
    out = engine.run_scripted_collection(env, 2, jax.random.PRNGKey(0),
                                         episode_len=4)
    path = tmp_path / "demos.hdf5"
    n = write_trajectories(path, out, successful_only=False)
    assert n == 2

    import h5py
    with h5py.File(path, "r") as f:
        g = f["data/demo_0"]
        for name in REFERENCE_SET:
            key = f"{name}_image"
            assert key in g["obs"] and key in g["next_obs"], key
            assert g["obs"][key].dtype == np.uint8, key
        for name in ("top", "angle", "front_close"):
            assert g["obs"][f"{name}_image"].shape == (4, 12, 16, 3)
        assert g["obs"]["wrist64_image"].shape == (4, 16, 16, 3)
        assert g["obs"]["left_pillar_image"].shape == (4, 64, 64, 3)


def test_five_camera_observation_set():
    env = AlohaTransferCubeEnv(camera_names=REFERENCE_SET, episode_len=10)
    _, obs = env.reset(jax.random.PRNGKey(0))
    for name in REFERENCE_SET:
        assert f"{name}_image" in obs, f"missing camera {name}"
    for name in ("top", "angle", "front_close"):
        img = np.asarray(obs[f"{name}_image"])
        assert img.shape == (480, 640, 3), (name, img.shape)
        assert img.std() > 5, f"{name} render is blank"
    assert np.asarray(obs["left_pillar_image"]).shape == (64, 64, 3)
    assert np.asarray(obs["wrist64_image"]).shape == (64, 64, 3)


def test_overhead_camera_basis_not_degenerate():
    """A straight-down camera (view direction parallel to the +z up hint)
    must render finite pixels — regression for the all-NaN `top` camera."""
    from latent_diffusion_planning_tpu.ops import render as R
    import jax.numpy as jnp

    cam = R.Camera(jnp.asarray([0.0, 0.6, 0.8]), jnp.asarray([0.0, 0.6, 0.0]),
                   jnp.asarray([0.0, 0.0, 1.0]), 78.0)
    dirs = R._camera_rays(cam, 8, 8)
    assert bool(jnp.isfinite(dirs).all())
    # rays still span the frustum (not collapsed to a line)
    assert float(jnp.std(dirs, axis=(0, 1)).max()) > 0.1
