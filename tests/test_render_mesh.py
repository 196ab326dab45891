"""Mesh-accurate rendering: convex k-DOP prims (ops/render kind=2).

Covers the generalized slab test (_ray_convex), the k-DOP fitting utilities
(envs/mjcf.fit_kdop / kdop_directions), the generated ViperX link table
(envs/aloha_kdops.py — re-verified against the reference STLs when mounted),
and the kdop mesh_mode of the ALOHA env. Pallas-kernel parity lives in
test_pallas_raycast (slow tier).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from latent_diffusion_planning_tpu.envs import mjcf
from latent_diffusion_planning_tpu.ops import render as R


def _box_planes(half):
    """A box expressed as its 6 axis half-spaces (the K=6 k-DOP)."""
    dirs = mjcf.kdop_directions(6)
    offs = np.abs(dirs) @ np.asarray(half)
    return jnp.asarray(np.concatenate([dirs, offs[:, None]], -1))


def _scene(kind, planes=None, rot_m=None):
    rot_m = jnp.eye(3) if rot_m is None else rot_m
    return R.Scene(
        pos=jnp.asarray([[0.0, 0.5, 0.1]]),
        rot=rot_m[None],
        size=jnp.asarray([[0.05, 0.03, 0.08]]),
        color=jnp.asarray([[0.8, 0.2, 0.1]]),
        kind=jnp.asarray([kind], jnp.int32),
        planes=planes)


CAM = R.look_at((0.3, 0.2, 0.5), (0.0, 0.5, 0.1))


def test_convex_box_matches_box_kind():
    """A kind-2 prim whose planes are a box's 6 slabs must render pixel-near
    the kind-0 box (same geometry through a different intersector)."""
    img_box = R.render(_scene(0), CAM, 32, 32)
    planes = _box_planes([0.05, 0.03, 0.08])[None]
    img_cvx = R.render(_scene(2, planes=planes), CAM, 32, 32)
    assert float(jnp.mean(jnp.abs(img_box - img_cvx))) < 0.5
    # and the shared-scene path with mixed kinds keeps box prims unchanged
    img_box2 = R.render(_scene(0, planes=planes), CAM, 32, 32)
    np.testing.assert_allclose(np.asarray(img_box), np.asarray(img_box2),
                               atol=1e-3)


def test_convex_rotated_matches_rotated_box():
    rot_m = R.euler_z(jnp.asarray(0.7))
    img_box = R.render(_scene(0, rot_m=rot_m), CAM, 32, 32)
    planes = _box_planes([0.05, 0.03, 0.08])[None]
    img_cvx = R.render(_scene(2, planes=planes, rot_m=rot_m), CAM, 32, 32)
    assert float(jnp.mean(jnp.abs(img_box - img_cvx))) < 0.5


def test_fit_kdop_contains_vertices():
    rng = np.random.RandomState(0)
    verts = rng.randn(200, 3).astype(np.float32) * 0.1
    planes = mjcf.fit_kdop(verts)
    assert planes.shape == (26, 4)
    slack = planes[:, 3][None] - verts @ planes[:, :3].T
    assert slack.min() >= -1e-5          # every vertex inside every plane
    # tight: each half-space touches at least one vertex
    assert np.abs(slack.min(axis=0)).max() < 1e-4


def test_kdop_tighter_than_bbox():
    """26-DOP of an octahedron-ish cloud cuts the bbox corners."""
    verts = np.asarray([[0.1, 0, 0], [-0.1, 0, 0], [0, 0.1, 0],
                        [0, -0.1, 0], [0, 0, 0.1], [0, 0, -0.1]], np.float32)
    planes = mjcf.fit_kdop(verts)
    corner = np.asarray([0.09, 0.09, 0.09])
    inside = (planes[:, :3] @ corner <= planes[:, 3] + 1e-6).all()
    assert not inside                    # bbox would contain it


def test_generated_table_shape_and_sanity():
    from latent_diffusion_planning_tpu.envs import aloha_kdops as AK
    assert AK.ARM_KDOPS.shape == (9, 26, 4)
    norms = np.linalg.norm(AK.ARM_KDOPS[..., :3], axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-4)
    # every hull is bounded with plausible robot-link extents (< 0.5 m)
    assert (AK.ARM_KDOPS[..., 3] < 0.5).all()
    # opposite-direction offsets sum to the extent: strictly positive
    widths = AK.ARM_KDOPS[:, 0, 3] + AK.ARM_KDOPS[:, 1, 3]
    assert (widths > 0.01).all()


REF_XML = "/root/reference/envs/assets/bimanual_viperx_transfer_cube.xml"


@pytest.mark.skipif(not __import__("pathlib").Path(REF_XML).exists(),
                    reason="reference assets not mounted")
def test_generated_table_matches_reference_assets():
    """tools/fit_kdops.py output is reproducible from the mounted STLs."""
    from latent_diffusion_planning_tpu.envs import aloha_kdops as AK
    from tools.fit_kdops import BODY_ORDER
    table = mjcf.body_kdops(REF_XML, [b for _, b in BODY_ORDER])
    fresh = np.stack([table[b] for _, b in BODY_ORDER])
    np.testing.assert_allclose(fresh, AK.ARM_KDOPS, atol=1e-6)


@pytest.mark.slow
def test_aloha_kdop_mesh_mode_renders():
    from latent_diffusion_planning_tpu.envs.aloha_cube import (
        AlohaTransferCubeEnv)
    env_box = AlohaTransferCubeEnv(renderer="xla", mesh_mode="box")
    env_kdop = AlohaTransferCubeEnv(renderer="xla", mesh_mode="kdop")
    rng = jax.random.PRNGKey(0)
    _, obs_b = jax.jit(env_box.reset)(rng)
    _, obs_k = jax.jit(env_kdop.reset)(rng)
    img_b = np.asarray(obs_b["wrist64_image"])
    img_k = np.asarray(obs_k["wrist64_image"])
    assert img_k.shape == img_b.shape
    assert np.isfinite(img_k).all()
    assert img_k.min() >= 0.0 and img_k.max() <= 255.0
    # same scene, different arm geometry: images differ but not wildly
    diff = np.abs(img_k - img_b).mean()
    assert 0.1 < diff < 120.0
