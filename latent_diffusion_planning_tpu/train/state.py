"""Train state pytree with integrated EMA tracking.

Parity with the reference's ``TrainStateEMA`` (reference: utils/flax_utils.py:
18-27) but self-contained (no flax.training dependency) and with EMA folded
into ``apply_gradients`` so a fused train step stays a single jitted function.
Also tracks the global step for true checkpoint resume — the reference's
restore path reinitializes optimizers and loses the step counter
(train_bc.py:210-240); here the full state (params, opt state, EMA, step) is
checkpointable as one pytree.
"""

from __future__ import annotations

from typing import Any, Callable

import flax.struct
import jax
import jax.numpy as jnp
import optax

nonpytree_field = lambda **kw: flax.struct.field(pytree_node=False, **kw)


class EMATrainState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: optax.OptState
    ema_params: Any  # None when ema_decay == 0
    apply_fn: Callable = nonpytree_field()
    tx: optax.GradientTransformation = nonpytree_field()
    ema_decay: float = nonpytree_field(default=0.0)

    @classmethod
    def create(cls, *, apply_fn: Callable, params: Any,
               tx: optax.GradientTransformation,
               ema_decay: float = 0.0) -> "EMATrainState":
        opt_state = tx.init(params)
        ema_params = jax.tree_util.tree_map(jnp.asarray, params) if ema_decay > 0 else None
        return cls(step=jnp.zeros((), jnp.int32), params=params,
                   opt_state=opt_state, ema_params=ema_params,
                   apply_fn=apply_fn, tx=tx, ema_decay=ema_decay)

    def apply_gradients(self, grads: Any) -> "EMATrainState":
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        if self.ema_decay > 0:
            d = self.ema_decay
            new_ema = jax.tree_util.tree_map(
                lambda e, p: e * d + p * (1.0 - d), self.ema_params, new_params)
        else:
            new_ema = self.ema_params
        return self.replace(step=self.step + 1, params=new_params,
                            opt_state=new_opt_state, ema_params=new_ema)

    @property
    def inference_params(self) -> Any:
        """EMA params when tracked, raw params otherwise."""
        return self.ema_params if self.ema_decay > 0 else self.params


def global_norm(tree: Any) -> jnp.ndarray:
    leaves = jax.tree_util.tree_leaves(tree)
    if not leaves:
        return jnp.zeros(())
    return jnp.sqrt(sum(jnp.sum(jnp.square(x)) for x in leaves))


def warmup_cosine_lr(lr: float, end_lr: float, warmup_steps: int,
                     decay_steps: int) -> optax.Schedule:
    """The reference's LR schedule (agent/ldp_agent.py:580-586): warmup from
    end_lr to lr, cosine decay back to end_lr."""
    return optax.warmup_cosine_decay_schedule(
        init_value=end_lr, peak_value=lr, warmup_steps=warmup_steps,
        decay_steps=decay_steps, end_value=end_lr)


def make_optimizer(lr: float, end_lr: float, warmup_steps: int,
                   decay_steps: int, grad_clip: float | None = None,
                   weight_decay: float = 0.0,
                   b1: float = 0.9, b2: float = 0.999) -> tuple[optax.GradientTransformation, optax.Schedule]:
    """Adam(W) + warmup-cosine (+ optional global-norm clipping)."""
    schedule = warmup_cosine_lr(lr, end_lr, warmup_steps, decay_steps)
    if weight_decay > 0:
        opt = optax.adamw(schedule, b1=b1, b2=b2, weight_decay=weight_decay)
    else:
        opt = optax.adam(schedule, b1=b1, b2=b2)
    if grad_clip is not None and grad_clip > 0:
        opt = optax.chain(optax.clip_by_global_norm(grad_clip), opt)
    return opt, schedule
