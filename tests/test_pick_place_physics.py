"""Contact-physics Can + Square: success semantics, contact grasping, experts.

These are the config-default Can/Square envs (configs/data/{can,square}/**):
the object is a free rigid body on the penalty-contact engine and grasping is
a physical contact event (robosuite `_check_grasp` parity — the reference
wraps robosuite PickPlaceCan / NutAssemblySquare,
envs/robosuite_env.py:180-190 `_check_success`).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from latent_diffusion_planning_tpu.envs.pick_place import BIN_CENTER, PEG_POS
from latent_diffusion_planning_tpu.envs.pick_place_physics import (
    CAN_HALF, OBJ, PEG_TOP, CanPhysicsEnv, SquarePhysicsEnv)
from latent_diffusion_planning_tpu.envs.lift import TABLE_Z
from latent_diffusion_planning_tpu.rollout import engine

pytestmark = pytest.mark.slow  # compile-heavy: run with -m "not slow" for the fast tier


@pytest.fixture(scope="module")
def can_env():
    return CanPhysicsEnv(render_images=False, episode_len=300)


@pytest.fixture(scope="module")
def square_env():
    return SquarePhysicsEnv(render_images=False, episode_len=300)


def _with_obj_at(state, pos):
    bodies = state.bodies.replace(pos=state.bodies.pos.at[OBJ].set(pos))
    return state.replace(bodies=bodies)


def test_can_success_geometry(can_env):
    state, _ = can_env.reset(jax.random.PRNGKey(0))
    settled = BIN_CENTER.at[2].set(TABLE_Z + float(CAN_HALF[2]))
    in_bin = _with_obj_at(state, settled)
    assert bool(can_env.check_success(in_bin))
    # hovering above the bin (still carried) is not success
    hover = _with_obj_at(state, settled + jnp.asarray([0.0, 0.0, 0.08]))
    assert not bool(can_env.check_success(hover))
    outside = _with_obj_at(state, settled + jnp.asarray([0.3, 0.0, 0.0]))
    assert not bool(can_env.check_success(outside))


def test_square_success_geometry(square_env):
    state, _ = square_env.reset(jax.random.PRNGKey(0))
    seated = PEG_POS.at[2].set(TABLE_Z + 0.01)
    on_peg = _with_obj_at(state, seated)
    assert bool(square_env.check_success(on_peg))
    # aligned but above the peg top = not inserted
    above = _with_obj_at(state, PEG_POS.at[2].set(PEG_TOP + 0.05))
    assert not bool(square_env.check_success(above))
    off = _with_obj_at(state, seated + jnp.asarray([0.1, 0.0, 0.0]))
    assert not bool(square_env.check_success(off))


def test_can_object_settles_from_rest(can_env):
    """The free can must rest stably on the penalty plane (no energy pump)."""
    state, _ = can_env.reset(jax.random.PRNGKey(3))
    z0 = float(state.bodies.pos[OBJ][2])

    def step_fn(s, _):
        s, _, _, _ = can_env.step(s, jnp.zeros(7))
        return s, s.bodies.pos[OBJ][2]

    state, zs = jax.lax.scan(step_fn, state, None, length=50)
    zs = np.asarray(zs)
    assert abs(zs[-1] - z0) < 0.01, f"can drifted {zs[-1] - z0:+.3f} m at rest"
    assert np.all(zs < z0 + 0.02), "can launched off the table"


def test_holding_is_contact_event(can_env):
    """`holding` requires both pads squeezing the object — not proximity."""
    state, _ = can_env.reset(jax.random.PRNGKey(1))
    assert not bool(can_env.holding(state))  # open gripper at home pose


@pytest.mark.parametrize("env_name", ["can", "square"])
def test_scripted_expert(env_name, can_env, square_env):
    env = can_env if env_name == "can" else square_env
    out = engine.run_scripted_collection(env, 8, jax.random.PRNGKey(1),
                                         episode_len=300)
    success = np.asarray(out["success"]).any(axis=1)
    assert success.mean() >= 0.9, f"{env_name} expert {success.mean():.0%}"


def test_renders():
    for cls in (CanPhysicsEnv, SquarePhysicsEnv):
        env = cls(render_images=True, image_size=32, episode_len=10)
        _, obs = env.reset(jax.random.PRNGKey(0))
        img = np.asarray(obs["agentview_image"])
        assert img.shape == (32, 32, 3) and img.std() > 5


def test_from_meta_routes_to_physics():
    """Recorded robosuite env names must rebuild the contact-physics envs."""
    from latent_diffusion_planning_tpu.envs.from_meta import make_env_from_meta
    env = make_env_from_meta({"env_name": "PickPlaceCan", "env_kwargs": {}},
                             render_images=False)
    assert isinstance(env, CanPhysicsEnv)
    env = make_env_from_meta({"env_name": "NutAssemblySquare",
                              "env_kwargs": {}}, render_images=False)
    assert isinstance(env, SquarePhysicsEnv)
