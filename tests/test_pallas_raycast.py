"""Pallas ray-cast kernel vs the XLA reference renderer (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np

from latent_diffusion_planning_tpu.ops import render as R
from latent_diffusion_planning_tpu.ops.pallas.raycast import (render_pallas,


                                                              render_batch_pallas)
import pytest

pytestmark = pytest.mark.slow  # compile-heavy: run with -m "not slow" for the fast tier



def _scene():
    return R.Scene(
        pos=jnp.asarray([[0.05, 0.0, 0.82], [0.0, 0.1, 0.9]]),
        rot=jnp.stack([R.euler_z(jnp.asarray(0.3)), jnp.eye(3)]),
        size=jnp.asarray([[0.02, 0.02, 0.02], [0.03, 0.0, 0.0]]),
        color=jnp.asarray([[0.85, 0.1, 0.1], [0.2, 0.4, 0.8]]),
        kind=jnp.asarray([0, 1], jnp.int32),
        plane_z=jnp.asarray(0.8, jnp.float32))


def test_kernel_matches_xla_renderer():
    cam = R.look_at(pos=(0.55, 0.0, 1.25), lookat=(0.0, 0.0, 0.85))
    scene = _scene()
    ref = np.asarray(R.render(scene, cam, 32, 64))
    out = np.asarray(render_pallas(scene, cam, 32, 64, interpret=True))
    assert out.shape == (32, 64, 3)
    # bulk agreement: identical pixels except a thin silhouette band where
    # nearest-hit ties resolve differently in float
    diff = np.abs(out - ref)
    frac_close = (diff.max(axis=-1) < 2.0).mean()
    assert frac_close > 0.98, f"only {frac_close:.1%} pixels match"


def test_kernel_batch():
    cam = R.look_at(pos=(0.55, 0.0, 1.25), lookat=(0.0, 0.0, 0.85))
    scene = _scene()
    batched = jax.tree_util.tree_map(lambda x: jnp.stack([x, x]), scene)
    out = render_batch_pallas(batched, cam, 16, 64, interpret=True)
    assert out.shape == (2, 16, 64, 3)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(out[1]))


def test_kernel_convex_matches_xla():
    """Convex k-DOP prims (mesh mode) agree between kernel and XLA path."""
    from latent_diffusion_planning_tpu.envs import mjcf
    dirs = mjcf.kdop_directions(26)
    # an octahedron-ish hull around the first prim position
    verts = np.asarray([[0.04, 0, 0], [-0.04, 0, 0], [0, 0.04, 0],
                        [0, -0.04, 0], [0, 0, 0.05], [0, 0, -0.05]],
                       np.float32)
    hull = jnp.asarray(mjcf.fit_kdop(verts, dirs))
    scene = R.Scene(
        pos=jnp.asarray([[0.05, 0.0, 0.88], [0.0, 0.1, 0.9]]),
        rot=jnp.stack([R.euler_z(jnp.asarray(0.4)), jnp.eye(3)]),
        size=jnp.asarray([[0.04, 0.04, 0.05], [0.03, 0.0, 0.0]]),
        color=jnp.asarray([[0.85, 0.1, 0.1], [0.2, 0.4, 0.8]]),
        kind=jnp.asarray([2, 1], jnp.int32),
        plane_z=jnp.asarray(0.8, jnp.float32),
        planes=jnp.stack([hull,
                          jnp.zeros((26, 4)).at[:, 3].set(1.0)]))
    cam = R.look_at(pos=(0.55, 0.0, 1.25), lookat=(0.0, 0.0, 0.85))
    ref = np.asarray(R.render(scene, cam, 32, 64))
    out = np.asarray(render_pallas(scene, cam, 32, 64, interpret=True,
                                   n_convex=1))
    diff = np.abs(out - ref)
    frac_close = (diff.max(axis=-1) < 2.0).mean()
    assert frac_close > 0.98, f"only {frac_close:.1%} pixels match"
