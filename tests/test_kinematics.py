"""Forward-kinematics + joint-servo tests."""

import jax
import jax.numpy as jnp
import numpy as np

from latent_diffusion_planning_tpu.envs.physics import kinematics as K


def test_fk_zero_pose_reach():
    chain = K.viperx300s_chain()
    pos, quat = K.eef_pose(chain, jnp.zeros(6))
    # arm extended along +x at zero pose: eef ahead of base and above ground
    assert float(pos[0]) > 0.2
    assert float(pos[2]) > 0.3
    np.testing.assert_allclose(np.asarray(quat), [1, 0, 0, 0], atol=1e-6)


def test_fk_waist_yaw_rotates_eef():
    chain = K.viperx300s_chain()
    p0, _ = K.eef_pose(chain, jnp.zeros(6))
    q = jnp.zeros(6).at[0].set(jnp.pi / 2)
    p1, _ = K.eef_pose(chain, q)
    # 90° waist yaw maps x→y
    np.testing.assert_allclose(float(p1[1]), float(p0[0]), atol=1e-5)
    np.testing.assert_allclose(float(p1[2]), float(p0[2]), atol=1e-5)


def test_fk_shoulder_pitch_lowers_eef():
    chain = K.viperx300s_chain()
    p0, _ = K.eef_pose(chain, jnp.zeros(6))
    q = jnp.zeros(6).at[1].set(0.5)
    p1, _ = K.eef_pose(chain, q)
    assert float(p1[2]) < float(p0[2])


def test_fk_batched_vmap():
    chain = K.viperx300s_chain()
    qs = jnp.zeros((8, 6)).at[:, 0].set(jnp.linspace(0, 1, 8))
    ps = jax.vmap(lambda q: K.eef_pose(chain, q)[0])(qs)
    assert ps.shape == (8, 3)
    assert not np.allclose(np.asarray(ps[0]), np.asarray(ps[-1]))


def test_fk_differentiable():
    chain = K.viperx300s_chain()

    def loss(q):
        p, _ = K.eef_pose(chain, q)
        return jnp.sum((p - jnp.asarray([0.3, 0.1, 0.3])) ** 2)

    g = jax.grad(loss)(jnp.zeros(6))
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).max() > 0
    # gradient descent reduces the distance (mini-IK)
    grad_fn = jax.jit(jax.grad(loss))
    q = jnp.zeros(6)
    l0 = float(loss(q))
    for _ in range(100):
        q = q - 0.1 * grad_fn(q)
    assert float(loss(q)) < l0 * 0.5, (l0, float(loss(q)))


def test_mirrored_chain():
    left = K.viperx300s_chain(base_pos=(-0.3, 0, 0), base_yaw=0.0)
    right = K.viperx300s_chain(base_pos=(0.3, 0, 0), base_yaw=np.pi)
    pl, _ = K.eef_pose(left, jnp.zeros(6))
    pr, _ = K.eef_pose(right, jnp.zeros(6))
    # facing each other: eefs between the bases
    assert float(pl[0]) > -0.3 and float(pr[0]) < 0.3


def test_servo_rate_limit_and_bounds():
    q = jnp.zeros(6)
    target = jnp.full(6, 1.0)
    q1 = K.servo_step(q, target, max_delta=0.1)
    np.testing.assert_allclose(np.asarray(q1), 0.1, atol=1e-7)
    # converges to the target
    for _ in range(20):
        q = K.servo_step(q, target, 0.1, K.VIPERX_LO, K.VIPERX_HI)
    np.testing.assert_allclose(np.asarray(q), 1.0, atol=1e-5)
    # limits respected
    q2 = K.servo_step(jnp.zeros(6), jnp.full(6, 10.0), 100.0,
                      K.VIPERX_LO, K.VIPERX_HI)
    assert np.all(np.asarray(q2) <= np.asarray(K.VIPERX_HI) + 1e-6)
