import jax
import jax.numpy as jnp
import numpy as np
import optax

from latent_diffusion_planning_tpu.train.state import (
    EMATrainState, global_norm, make_optimizer, warmup_cosine_lr)


def _state(ema_decay=0.0, lr=0.1):
    params = {"w": jnp.ones((3,))}
    return EMATrainState.create(apply_fn=lambda p, x: x * p["w"], params=params,
                                tx=optax.sgd(lr), ema_decay=ema_decay)


def test_apply_gradients_sgd():
    st = _state()
    st2 = st.apply_gradients({"w": jnp.ones((3,))})
    np.testing.assert_allclose(np.asarray(st2.params["w"]), 0.9, rtol=1e-6)
    assert int(st2.step) == 1


def test_ema_update():
    st = _state(ema_decay=0.9)
    st2 = st.apply_gradients({"w": jnp.ones((3,))})
    # ema = 0.9 * 1.0 + 0.1 * 0.9 = 0.99
    np.testing.assert_allclose(np.asarray(st2.ema_params["w"]), 0.99, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(st2.inference_params["w"]), 0.99,
                               rtol=1e-6)


def test_no_ema_inference_params_are_raw():
    st = _state(ema_decay=0.0)
    assert st.ema_params is None
    st2 = st.apply_gradients({"w": jnp.zeros((3,))})
    np.testing.assert_allclose(np.asarray(st2.inference_params["w"]), 1.0)


def test_state_is_jit_compatible():
    st = _state(ema_decay=0.5)

    @jax.jit
    def step(s, g):
        return s.apply_gradients(g)

    st2 = step(st, {"w": jnp.ones((3,))})
    assert int(st2.step) == 1


def test_warmup_cosine_schedule_endpoints():
    sched = warmup_cosine_lr(lr=1e-4, end_lr=1e-6, warmup_steps=10,
                             decay_steps=100)
    assert abs(float(sched(0)) - 1e-6) < 1e-9
    assert abs(float(sched(10)) - 1e-4) < 1e-9
    assert abs(float(sched(100)) - 1e-6) < 1e-8


def test_make_optimizer_with_clip():
    tx, sched = make_optimizer(1e-3, 1e-5, 5, 50, grad_clip=1.0)
    params = {"w": jnp.ones((4,))}
    st = EMATrainState.create(apply_fn=None, params=params, tx=tx)
    big_grad = {"w": jnp.full((4,), 100.0)}
    st2 = st.apply_gradients(big_grad)
    # update magnitude bounded by clip * lr-ish
    delta = np.abs(np.asarray(st2.params["w"] - st.params["w"]))
    assert delta.max() < 1e-2


def test_global_norm():
    tree = {"a": jnp.array([3.0]), "b": jnp.array([4.0])}
    assert abs(float(global_norm(tree)) - 5.0) < 1e-6
