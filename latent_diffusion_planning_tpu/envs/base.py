"""Vectorized environment protocol: pure reset/step functions over pytrees.

TPU-native replacement for the reference's env wrappers
(envs/robosuite_env.py:61-223 — reset/reset_to/step/get_observation/
is_success over a host MuJoCo process; envs/alohasim_env.py). Here an
environment is a *pure function pair* over an explicit state pytree:

    state, obs = env.reset(rng)
    state, obs, reward, success = env.step(state, action)

so thousands of envs batch with ``vmap``, whole episodes run under
``lax.scan``, and the rollout engine fuses plan→act→step into one jitted
program (rollout/engine.py). Determinism is free: a reset is a function of
its rng key (parity with the reference's seeded reset_to replay,
robosuite_env.py:88-120).
"""

from __future__ import annotations

from typing import Any, Mapping, Protocol

import jax


class VectorEnv(Protocol):
    """Structural protocol every device env implements."""

    #: observation keys produced by obs(); images are HWC float32 [0,255]
    obs_keys: tuple[str, ...]
    action_dim: int
    episode_len: int
    max_reward: float

    def reset(self, rng: jax.Array):
        """rng -> (state, obs_dict). Pure; vmap over keys for batches."""
        ...

    def step(self, state, action):
        """(state, (A,)) -> (state, obs_dict, reward, success). Pure."""
        ...

    def get_state(self, state) -> Any:
        """Serializable snapshot (parity: robosuite_env.py:192-223)."""
        ...

    def reset_to(self, state):
        """state -> (state, obs): deterministic state-injection reset
        (parity: robosuite_env.py:88-120 reset_to replay)."""
        ...


def spec_shapes(env: VectorEnv, rng: jax.Array | None = None) -> dict:
    """Infer per-key obs shapes by evaluating reset's shape dtype only."""
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    state, obs = jax.eval_shape(env.reset, rng)
    return {k: tuple(v.shape) for k, v in obs.items()}
