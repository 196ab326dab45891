"""Min/max normalization of observation/action pytrees.

Capability parity with the reference's normalization lib
(reference: utils/data_utils.py:6-80): per-key ``{min,max}`` bounds map values
to [-1, 1] and back, ``{clip_min,clip_max}`` clips (used for actions), and
stats with fewer leading dims than the data broadcast from the right.

TPU-first differences: bounds live in a plain pytree of ``jnp`` arrays (jit- and
shard-friendly), broadcasting is a single reshape instead of an unrolled
expand_dims ladder, and everything is safe to call inside a fused train or
rollout step.
"""

from __future__ import annotations

from typing import Any, Mapping

import jax.numpy as jnp
import numpy as np

Stats = Mapping[str, Any]


def stats_to_arrays(stats: Stats) -> dict:
    """Convert a nested config of bounds (lists / scalars) to jnp arrays.

    Scalar ints stay python scalars (e.g. image min 0 / max 255), matching the
    reference's cfg_to_jnp (utils/flax_utils.py:84-87).
    """
    out: dict = {}
    for k, v in stats.items():
        if isinstance(v, Mapping):
            out[k] = stats_to_arrays(v)
        elif isinstance(v, (list, tuple, np.ndarray)):
            out[k] = jnp.asarray(v, dtype=jnp.float32)
        else:
            out[k] = v
    return out


def _broadcast_bound(bound: Any, target_ndim: int) -> Any:
    if isinstance(bound, (int, float)):
        return bound
    extra = target_ndim - bound.ndim
    if extra < 0:
        raise ValueError(f"bound rank {bound.ndim} exceeds data rank {target_ndim}")
    return bound.reshape((1,) * extra + bound.shape)


def normalize_to_unit(val: jnp.ndarray, lo: Any, hi: Any) -> jnp.ndarray:
    """Map [lo, hi] -> [-1, 1]."""
    lo = _broadcast_bound(lo, val.ndim)
    hi = _broadcast_bound(hi, val.ndim)
    return (val - lo) / (hi - lo) * 2.0 - 1.0


def unnormalize_from_unit(val: jnp.ndarray, lo: Any, hi: Any) -> jnp.ndarray:
    """Map [-1, 1] -> [lo, hi] (clipped to bounds, guarding fp error)."""
    lo = _broadcast_bound(lo, val.ndim)
    hi = _broadcast_bound(hi, val.ndim)
    out = (val + 1.0) * 0.5 * (hi - lo) + lo
    return jnp.clip(out, lo, hi)


def _apply_key(val: jnp.ndarray, spec: Stats, forward: bool) -> jnp.ndarray:
    if not jnp.issubdtype(val.dtype, jnp.floating):
        val = val.astype(jnp.float32)  # uint8 images stay compact in HBM
    if "mean" in spec:
        raise NotImplementedError("mean/std normalization not used by any config")
    if "min" in spec:
        if forward:
            return normalize_to_unit(val, spec["min"], spec["max"])
        return unnormalize_from_unit(val, spec["min"], spec["max"])
    if "clip_min" in spec:
        return jnp.clip(val, spec["clip_min"], spec["clip_max"])
    raise NotImplementedError(f"unknown normalization spec keys: {list(spec)}")


def normalize_tree(batch: Mapping[str, jnp.ndarray], stats: Stats) -> dict:
    """Normalize every key of ``batch`` using per-key specs in ``stats``."""
    missing = set(batch) - set(stats)
    if missing:
        raise KeyError(f"no normalization stats for keys {sorted(missing)}")
    return {k: _apply_key(jnp.asarray(v), stats[k], forward=True) for k, v in batch.items()}


def unnormalize_tree(batch: Mapping[str, jnp.ndarray], stats: Stats) -> dict:
    missing = set(batch) - set(stats)
    if missing:
        raise KeyError(f"no normalization stats for keys {sorted(missing)}")
    return {k: _apply_key(jnp.asarray(v), stats[k], forward=False) for k, v in batch.items()}


def normalize_batch(batch: Mapping[str, Any], stats: Stats) -> dict:
    """Normalize a training batch ``{obs: {...}, actions: ...}``.

    Parity with reference postprocess_batch (utils/data_utils.py:70-74):
    obs keys use ``stats['obs']``, actions use ``stats['actions']``.
    """
    out = {"obs": normalize_tree(batch["obs"], stats["obs"])}
    if "actions" in batch:
        out["actions"] = normalize_tree({"actions": batch["actions"]}, stats)["actions"]
    return out


def unnormalize_actions(actions: jnp.ndarray, stats: Stats) -> jnp.ndarray:
    return unnormalize_tree({"actions": actions}, stats)["actions"]


def compute_minmax_stats(arrays: Mapping[str, np.ndarray], margin: float = 0.0) -> dict:
    """Compute per-key elementwise min/max over the leading axis.

    Offline tool for new datasets (parity with reference normalize_obs,
    data/robomimic_data.py:145-176, incl. its 10% adjusted bounds via margin).
    """
    stats: dict = {}
    for k, v in arrays.items():
        lo = np.min(v, axis=0)
        hi = np.max(v, axis=0)
        if margin:
            lo = np.where(lo < 0, lo * (1 + margin), lo * (1 - margin))
            hi = np.where(hi < 0, hi * (1 - margin), hi * (1 + margin))
        stats[k] = {"min": lo.astype(np.float32), "max": hi.astype(np.float32)}
    return stats
