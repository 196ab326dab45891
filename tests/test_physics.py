"""Physics-core regression tests: free fall, resting contact, friction,
sphere/box collisions, energy sanity, vmap batching."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from latent_diffusion_planning_tpu.envs import physics as ph
from latent_diffusion_planning_tpu.ops import rotations as rot


def _single_box_world(half=0.02, mass=0.1, plane_z=0.0):
    geoms = ph.build_geoms([ph.make_box_geom([half] * 3, body_id=0)])
    inertia = jnp.asarray([[mass * (2 * half) ** 2 / 6.0] * 3])
    return ph.World.create(mass=[mass], inertia=inertia, geoms=geoms,
                           plane_z=plane_z)


def test_free_fall_matches_kinematics():
    world = _single_box_world()
    params = ph.PhysicsParams(dt=0.001, linear_damping=0.0)
    body = ph.RigidBody.create(pos=[[0.0, 0.0, 1.0]])
    n = 100
    out = ph.multi_step(world, body, params, n)
    t = n * params.dt
    # semi-implicit Euler: z = z0 + g*dt^2*(n(n+1)/2)
    expected = 1.0 + params.gravity * params.dt ** 2 * (n * (n + 1) / 2)
    np.testing.assert_allclose(float(out.pos[0, 2]), expected, rtol=1e-4)


def test_box_rests_on_plane():
    world = _single_box_world(half=0.02)
    params = ph.PhysicsParams(dt=0.002)
    body = ph.RigidBody.create(pos=[[0.0, 0.0, 0.2]])
    out = ph.multi_step(world, body, params, 1500)
    # settles at ~half-extent above the plane (soft contact → small overlap)
    z = float(out.pos[0, 2])
    assert 0.013 < z < 0.022, z
    assert abs(float(out.linvel[0, 2])) < 0.05


def test_friction_stops_sliding():
    world = _single_box_world()
    params = ph.PhysicsParams(dt=0.002, mu=1.0)
    body = ph.RigidBody.create(pos=[[0.0, 0.0, 0.02]],
                               linvel=[[0.5, 0.0, 0.0]])
    out = ph.multi_step(world, body, params, 1500)
    assert abs(float(out.linvel[0, 0])) < 0.02   # friction dissipated it
    assert float(out.pos[0, 0]) > 0.005          # but it did slide


def test_frictionless_keeps_sliding():
    world = _single_box_world()
    params = ph.PhysicsParams(dt=0.002, mu=0.0, linear_damping=0.0)
    body = ph.RigidBody.create(pos=[[0.0, 0.0, 0.02]],
                               linvel=[[0.5, 0.0, 0.0]])
    out = ph.multi_step(world, body, params, 500)
    assert float(out.linvel[0, 0]) > 0.4


def test_sphere_box_collision_pushes_apart():
    # sphere overlapping a static box
    geoms = ph.build_geoms([
        ph.make_sphere_geom(0.05, body_id=0),
        ph.make_box_geom([0.1, 0.1, 0.1], body_id=-1, offset=[0.0, 0.0, 0.0]),
    ])
    world = ph.World.create(mass=[0.1], inertia=[[1e-4] * 3], geoms=geoms,
                            plane_z=-10.0)
    params = ph.PhysicsParams(dt=0.001, gravity=0.0)
    body = ph.RigidBody.create(pos=[[0.0, 0.0, 0.12]])  # overlaps top face
    out = ph.multi_step(world, body, params, 200)
    assert float(out.pos[0, 2]) > 0.13  # pushed out of the box


def test_kinematic_body_unaffected():
    geoms = ph.build_geoms([
        ph.make_box_geom([0.02] * 3, body_id=0),
        ph.make_box_geom([0.05] * 3, body_id=1),
    ])
    world = ph.World.create(mass=[0.1, 1.0],
                            inertia=[[1e-4] * 3, [1e-3] * 3],
                            geoms=geoms, plane_z=0.0,
                            kinematic=[False, True])
    params = ph.PhysicsParams(dt=0.002)
    body = ph.RigidBody.create(pos=[[0.0, 0.0, 0.5], [0.3, 0.0, 0.5]])
    out = ph.multi_step(world, body, params, 200)
    np.testing.assert_allclose(np.asarray(out.pos[1]), [0.3, 0.0, 0.5])
    assert float(out.pos[0, 2]) < 0.4  # dynamic body fell


def test_box_box_stacking():
    geoms = ph.build_geoms([
        ph.make_box_geom([0.03] * 3, body_id=0),
        ph.make_box_geom([0.1, 0.1, 0.05], body_id=-1,
                         offset=[0.0, 0.0, 0.05]),  # static platform, top at .1
    ])
    world = ph.World.create(mass=[0.1], inertia=[[6e-5] * 3], geoms=geoms,
                            plane_z=-10.0)
    params = ph.PhysicsParams(dt=0.002)
    body = ph.RigidBody.create(pos=[[0.0, 0.0, 0.25]])
    out = ph.multi_step(world, body, params, 1500)
    z = float(out.pos[0, 2])
    assert 0.115 < z < 0.135, z  # resting on the platform, not the plane


def test_force_based_grasp_and_lift():
    """Two kinematic sphere finger pads squeeze a cube; friction lifts it —
    the force-based replacement for the kinematic-attach grasp."""
    geoms = ph.build_geoms([
        ph.make_box_geom([0.02] * 3, body_id=0),
        ph.make_sphere_geom(0.006, body_id=1),
        ph.make_sphere_geom(0.006, body_id=2),
    ])
    world = ph.World.create(mass=[0.05, 1.0, 1.0],
                            inertia=[[2e-5] * 3] * 3, geoms=geoms,
                            plane_z=0.0, kinematic=[False, True, True])
    params = ph.PhysicsParams(dt=0.002, mu=1.5, kt=2000.0)
    body = ph.RigidBody.create(pos=[[0.0, 0.0, 0.02],
                                    [-0.04, 0.0, 0.02],
                                    [0.04, 0.0, 0.02]])

    def step(b, t):
        squeeze = jnp.minimum(t * 0.0001, 0.0155)
        lift = jnp.minimum(jnp.maximum(t - 300, 0) * 0.0002, 0.15)
        lift_v = jnp.where((t > 300) & (lift < 0.15), 0.1, 0.0)
        fx = 0.04 - squeeze
        pos = jnp.stack([b.pos[0],
                         jnp.asarray([-fx, 0.0, 0.02 + lift]),
                         jnp.asarray([fx, 0.0, 0.02 + lift])])
        lv = (b.linvel.at[1].set(jnp.asarray([0.0, 0.0, lift_v]))
              .at[2].set(jnp.asarray([0.0, 0.0, lift_v])))
        b = b.replace(pos=pos, linvel=lv)
        return ph.free_body_step(world, b, params), None

    final, _ = jax.lax.scan(step, body, jnp.arange(2000))
    assert float(final.pos[0, 2]) > 0.13, float(final.pos[0, 2])


def test_vmap_batch_of_worlds():
    world = _single_box_world()
    params = ph.PhysicsParams(dt=0.002)

    def run(z0):
        body = ph.RigidBody.create(pos=jnp.asarray([[0.0, 0.0, 0.0]]) +
                                   jnp.asarray([0.0, 0.0, 1.0]) * z0)
        return ph.multi_step(world, body, params, 50).pos[0, 2]

    zs = jax.vmap(run)(jnp.asarray([0.5, 1.0, 2.0]))
    assert zs.shape == (3,)
    assert float(zs[0]) < float(zs[1]) < float(zs[2])


def test_rotation_roundtrips():
    rng = np.random.default_rng(0)
    aa = jnp.asarray(rng.normal(size=(5, 3)) * 0.8)
    q = rot.axis_angle_to_quat(aa)
    np.testing.assert_allclose(np.asarray(rot.quat_to_axis_angle(q)),
                               np.asarray(aa), atol=1e-5)
    m = rot.quat_to_matrix(q)
    q2 = rot.matrix_to_quat(m)
    # q and -q are the same rotation
    dots = np.abs(np.sum(np.asarray(q) * np.asarray(q2), axis=-1))
    np.testing.assert_allclose(dots, 1.0, atol=1e-5)


def test_quat_rotate_matches_matrix():
    rng = np.random.default_rng(1)
    q = rot.quat_normalize(jnp.asarray(rng.normal(size=(4,))))
    v = jnp.asarray(rng.normal(size=(3,)))
    np.testing.assert_allclose(np.asarray(rot.quat_rotate(q, v)),
                               np.asarray(rot.quat_to_matrix(q) @ v),
                               atol=1e-5)


def test_quat_to_axis_angle_xyzw_reference_convention():
    # identity rotation in xyzw is (0,0,0,1) → zero vector (data_utils parity)
    out = rot.quat_to_axis_angle_xyzw(jnp.asarray([0.0, 0.0, 0.0, 1.0]))
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-7)
    # 90° about z: xyzw = (0, 0, sin45, cos45) → (0, 0, π/2)
    s = np.sin(np.pi / 4)
    out = rot.quat_to_axis_angle_xyzw(jnp.asarray([0.0, 0.0, s, s]))
    np.testing.assert_allclose(np.asarray(out), [0.0, 0.0, np.pi / 2],
                               atol=1e-5)
