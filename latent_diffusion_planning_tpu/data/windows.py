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
    sample_logits: jnp.ndarray | None = None  # (N,) categorical draw logits
    frame_stack: int = nonpytree_field(default=1)
    seq_length: int = nonpytree_field(default=1)
    obs_keys: tuple = nonpytree_field(default=())
    dataset_keys: tuple = nonpytree_field(default=())

    @classmethod
    def from_welded(cls, welded: WeldedDemos, frame_stack: int,
                    seq_length: int, device_put: bool = True,
                    sample_weights: np.ndarray | None = None) -> "DeviceDataset":
        assert frame_stack >= 1 and seq_length >= 1
        n = welded.total_steps
        start = np.repeat(welded.demo_starts, welded.demo_lengths)
        end = np.repeat(welded.demo_starts + welded.demo_lengths,
                        welded.demo_lengths)
        put = jnp.asarray if device_put else (lambda x: x)
        logits = None
        if sample_weights is not None:
            assert sample_weights.shape == (n,), (
                f"sample_weights shape {sample_weights.shape} != ({n},)")
            logits = put(np.log(sample_weights.astype(np.float32)))
        return cls(arrays={k: put(v) for k, v in welded.arrays.items()},
                   step_demo_start=put(start.astype(np.int32)),
                   step_demo_end=put(end.astype(np.int32)),
                   sample_logits=logits,
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
        if self.sample_logits is not None:
            # weighted draw (e.g. event oversampling): one fused categorical
            # over all N steps — still a single gather per batch
            idx = jax.random.categorical(rng, self.sample_logits,
                                         shape=(batch_size,)).astype(jnp.int32)
        else:
            idx = jax.random.randint(rng, (batch_size,), 0, self.n_steps)
        return self.gather(idx)

    # ------------------------------------------------------------------
    def iter_batches(self, rng: jax.Array, batch_size: int) -> Iterator[dict]:
        """Infinite batch iterator (host loop driving jitted sampling)."""
        while True:
            rng, sub = jax.random.split(rng)
            yield self.sample(sub, batch_size)


def action_event_weights(welded: WeldedDemos, channels: Sequence[int],
                         boost: float = 3.0, halfwidth: int = 8,
                         key: str = "actions") -> np.ndarray:
    """Per-step sampling weights that upweight action-channel EVENTS.

    For each demo independently: the per-step activity is the summed
    |Δaction| over ``channels``, box-smoothed over ±``halfwidth`` steps and
    normalized by its demo max, giving weight ``1 + boost·activity`` ∈
    [1, 1+boost]. Steps where the selected channels move (e.g. the two
    ALOHA gripper open/close commands at grasp and handover) are sampled up
    to (1+boost)× more often than quiescent transport/hold stretches.

    Host-side, runs once at dataset build. No reference analogue (the
    reference samples uniformly); this is the round-4 diagnosed lever for
    the bimanual handover — the event instants are a few steps out of ~400
    and uniform sampling starves them.
    """
    acts = np.asarray(welded.arrays[key], np.float32)
    sel = acts[:, list(channels)]
    w = np.ones(len(acts), np.float32)
    kernel = np.ones(2 * int(halfwidth) + 1, np.float32)
    for s, L in zip(welded.demo_starts, welded.demo_lengths):
        g = sel[s:s + L]
        d = np.abs(np.diff(g, axis=0)).sum(axis=1)
        d = np.concatenate([[0.0], d])
        smooth = np.convolve(d, kernel, mode="same")
        peak = smooth.max()
        if peak > 0:
            w[s:s + L] = 1.0 + float(boost) * smooth / peak
    return w


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
               sub_sizes: Sequence[int], probs: Sequence[float],
               step_weights: np.ndarray | None = None) -> "MixedDeviceDataset":
        p = np.asarray(probs, np.float32)
        assert p.ndim == 1 and len(p) == len(sub_offsets) == len(sub_sizes)
        p = p / p.sum()
        if step_weights is not None:
            # fold per-step weights into one global categorical that is
            # EXACTLY the two-stage mixture: P(i ∈ sub k) = p_k · w_i / Σ_k w
            n = dataset.n_steps
            assert step_weights.shape == (n,)
            logits = np.full(n, -np.inf, np.float32)
            for off, size, pk in zip(sub_offsets, sub_sizes, p):
                wk = step_weights[off:off + size].astype(np.float64)
                with np.errstate(divide="ignore"):
                    logits[off:off + size] = (
                        np.log(pk) + np.log(wk) - np.log(wk.sum()))
            dataset = dataset.replace(sample_logits=jnp.asarray(logits))
        return cls(dataset=dataset,
                   sub_offsets=jnp.asarray(sub_offsets, jnp.int32),
                   sub_sizes=jnp.asarray(sub_sizes, jnp.int32),
                   probs=jnp.asarray(p))

    @partial(jax.jit, static_argnames=("batch_size",))
    def sample(self, rng: jax.Array, batch_size: int) -> dict:
        if self.dataset.sample_logits is not None:
            return self.dataset.sample(rng, batch_size)
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
