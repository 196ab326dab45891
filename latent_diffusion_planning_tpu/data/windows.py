"""Device-resident window sampling over welded demo arrays.

The TPU-native replacement for the reference's torch DataLoader fleet
(data/robomimic_data.py:97-132, 260-282): welded arrays live in HBM (images
stay uint8 — 4× less bandwidth than fp32), and a training batch is a single
jitted gather, so batch sampling fuses into the train step with zero host
round-trips and no worker processes.

Window semantics parity (data/robomimic_data.py:101-132): a sample at index i
covers steps ``[i - frame_stack + 1, i + seq_length)`` of i's demo; edge
padding at demo boundaries is index *clamping* (pad-start repeats the first
frame, pad-end the last — identical to the reference's explicit pads); obs
keys get the full ``frame_stack - 1 + seq_length`` window while dataset keys
(actions) drop the stacked prefix.
"""

from __future__ import annotations

from functools import partial
from typing import Iterator, Sequence

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from .ingest import WeldedDemos

nonpytree_field = lambda **kw: flax.struct.field(pytree_node=False, **kw)


class DeviceDataset(flax.struct.PyTreeNode):
    """Welded arrays + per-step demo extents, resident on device."""

    arrays: dict[str, jnp.ndarray]
    step_demo_start: jnp.ndarray   # (N,) demo start index of each step
    step_demo_end: jnp.ndarray     # (N,) demo end (exclusive) of each step
    frame_stack: int = nonpytree_field()
    seq_length: int = nonpytree_field()
    obs_keys: tuple = nonpytree_field()
    dataset_keys: tuple = nonpytree_field()

    @classmethod
    def from_welded(cls, welded: WeldedDemos, frame_stack: int,
                    seq_length: int, device_put: bool = True) -> "DeviceDataset":
        assert frame_stack >= 1 and seq_length >= 1
        n = welded.total_steps
        start = np.repeat(welded.demo_starts, welded.demo_lengths)
        end = np.repeat(welded.demo_starts + welded.demo_lengths,
                        welded.demo_lengths)
        put = jnp.asarray if device_put else (lambda x: x)
        return cls(arrays={k: put(v) for k, v in welded.arrays.items()},
                   step_demo_start=put(start.astype(np.int32)),
                   step_demo_end=put(end.astype(np.int32)),
                   frame_stack=frame_stack, seq_length=seq_length,
                   obs_keys=tuple(welded.obs_keys),
                   dataset_keys=tuple(welded.dataset_keys))

    @property
    def n_steps(self) -> int:
        return self.step_demo_start.shape[0]

    # ------------------------------------------------------------------
    def gather(self, idx: jnp.ndarray) -> dict:
        """Assemble windows for sample indices ``idx`` (B,) → batch pytree."""
        fs, sl = self.frame_stack, self.seq_length
        offsets = jnp.arange(-fs + 1, sl, dtype=jnp.int32)  # (fs-1+sl,)
        pos = idx[:, None] + offsets[None, :]
        lo = self.step_demo_start[idx][:, None]
        hi = self.step_demo_end[idx][:, None] - 1
        pos = jnp.clip(pos, lo, hi)  # edge padding by clamping

        batch: dict = {"obs": {}}
        for k in self.obs_keys:
            batch["obs"][k] = self.arrays[k][pos]
        for k in self.dataset_keys:
            batch[k] = self.arrays[k][pos[:, fs - 1:]]
        return batch

    @partial(jax.jit, static_argnames=("batch_size",))
    def sample(self, rng: jax.Array, batch_size: int) -> dict:
        idx = jax.random.randint(rng, (batch_size,), 0, self.n_steps)
        return self.gather(idx)

    # ------------------------------------------------------------------
    def iter_batches(self, rng: jax.Array, batch_size: int) -> Iterator[dict]:
        """Infinite batch iterator (host loop driving jitted sampling)."""
        while True:
            rng, sub = jax.random.split(rng)
            yield self.sample(sub, batch_size)


class MixedDeviceDataset(flax.struct.PyTreeNode):
    """Weighted mixture over concatenated sub-datasets.

    Parity with the reference's mixed datasets (data/robomimic_mixed_data.py:
    80-84: per-item categorical draw over sub-datasets by ``train_split``).
    All subs share one welded array (ingest.concat_welded); a draw picks a sub
    then a uniform step inside it — still a single fused gather.
    """

    dataset: DeviceDataset
    sub_offsets: jnp.ndarray   # (K,) first step index of each sub
    sub_sizes: jnp.ndarray     # (K,) number of steps of each sub
    probs: jnp.ndarray         # (K,) sampling probabilities

    @classmethod
    def create(cls, dataset: DeviceDataset, sub_offsets: Sequence[int],
               sub_sizes: Sequence[int],
               probs: Sequence[float]) -> "MixedDeviceDataset":
        p = np.asarray(probs, np.float32)
        assert p.ndim == 1 and len(p) == len(sub_offsets) == len(sub_sizes)
        p = p / p.sum()
        return cls(dataset=dataset,
                   sub_offsets=jnp.asarray(sub_offsets, jnp.int32),
                   sub_sizes=jnp.asarray(sub_sizes, jnp.int32),
                   probs=jnp.asarray(p))

    @partial(jax.jit, static_argnames=("batch_size",))
    def sample(self, rng: jax.Array, batch_size: int) -> dict:
        d_rng, u_rng = jax.random.split(rng)
        choice = jax.random.categorical(
            d_rng, jnp.log(self.probs), shape=(batch_size,))
        u = jax.random.uniform(u_rng, (batch_size,))
        within = jnp.floor(u * self.sub_sizes[choice]).astype(jnp.int32)
        idx = self.sub_offsets[choice] + within
        return self.dataset.gather(idx)

    def iter_batches(self, rng: jax.Array, batch_size: int) -> Iterator[dict]:
        while True:
            rng, sub = jax.random.split(rng)
            yield self.sample(sub, batch_size)


def sample_traj(welded: WeldedDemos, ep: int) -> dict:
    """Whole-trajectory batch for eval/viz, each obs key (T, 1, ...).

    Parity: data/robomimic_data.py:134-143 (host-side; variable length).
    """
    demo = welded.demo_slice(ep)
    batch: dict = {"obs": {}}
    for k in welded.obs_keys:
        batch["obs"][k] = demo[k][:, None]
    for k in welded.dataset_keys:
        batch[k] = demo[k]
    return batch
