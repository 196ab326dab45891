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
