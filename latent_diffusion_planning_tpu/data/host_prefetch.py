"""Host-side native window prefetching for beyond-HBM datasets.

The default data path keeps welded arrays in HBM and samples batches with one
jitted gather (data/windows.DeviceDataset) — zero host involvement. Datasets
that don't fit HBM need host-resident arrays (optionally ``np.load(...,
mmap_mode='r')`` memory-maps for beyond-RAM shards) with batches assembled on
the host and streamed to the device. The reference covers this capability
with a torch DataLoader worker-process fleet (data/robomimic_data.py:
260-282); here it is a native C++ engine (native/window_prefetch.cpp):
worker threads gather window batches with the exact clamped-window semantics
of ``DeviceDataset.gather`` into a ring of slot buffers, overlapping host
gathering with device compute — threads + shared memory instead of worker
processes + pickled tensors.

Built on demand with g++ (see native/build.py); everything degrades to the
pure-JAX path when no compiler is available.
"""

from __future__ import annotations

import ctypes
import subprocess
from typing import Iterator

import numpy as np

from .ingest import WeldedDemos


def _load_lib():
    from pathlib import Path
    import sys

    sys.path.insert(0, str(Path(__file__).resolve().parents[2] / "native"))
    import build as native_build

    lib = ctypes.CDLL(str(native_build.ensure_built()))
    lib.wp_create.restype = ctypes.c_void_p
    lib.wp_create.argtypes = [
        ctypes.c_int, ctypes.POINTER(ctypes.c_void_p),
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_uint64]
    lib.wp_next.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_void_p),
                            ctypes.POINTER(ctypes.c_int64)]
    lib.wp_destroy.argtypes = [ctypes.c_void_p]
    return lib


def available() -> bool:
    """True iff the native engine builds and loads on this host.

    Callers choosing between HostPrefetcher and the device gather path
    should gate on this rather than catching load failures themselves —
    the build is content-hash cached so the probe is cheap after the first
    call.
    """
    try:
        _load_lib()
        return True
    except (OSError, subprocess.CalledProcessError, FileNotFoundError,
            ImportError):
        return False


class HostPrefetcher:
    """Ring-buffered native batch sampler over (possibly memmapped) arrays."""

    def __init__(self, welded: WeldedDemos, frame_stack: int, seq_length: int,
                 batch_size: int, *, n_slots: int = 4, n_threads: int = 2,
                 seed: int = 0):
        self._lib = _load_lib()
        self.frame_stack = frame_stack
        self.seq_length = seq_length
        self.batch_size = batch_size
        self.obs_keys = tuple(welded.obs_keys)
        self.dataset_keys = tuple(welded.dataset_keys)
        self.keys = self.obs_keys + self.dataset_keys

        n = welded.total_steps
        self._demo_start = np.repeat(welded.demo_starts,
                                     welded.demo_lengths).astype(np.int32)
        self._demo_end = np.repeat(welded.demo_starts + welded.demo_lengths,
                                   welded.demo_lengths).astype(np.int32)
        # keep references so memmaps/arrays outlive the engine
        self._arrays = [np.ascontiguousarray(welded.arrays[k])
                        if not welded.arrays[k].flags["C_CONTIGUOUS"]
                        else welded.arrays[k] for k in self.keys]

        n_keys = len(self.keys)
        ptrs = (ctypes.c_void_p * n_keys)(
            *[a.ctypes.data_as(ctypes.c_void_p).value for a in self._arrays])
        row_bytes = (ctypes.c_int64 * n_keys)(
            *[int(a.strides[0]) for a in self._arrays])
        is_obs = (ctypes.c_uint8 * n_keys)(
            *[1 if k in self.obs_keys else 0 for k in self.keys])
        self._handle = self._lib.wp_create(
            n_keys, ptrs, row_bytes, is_obs, n,
            self._demo_start.ctypes.data_as(ctypes.c_void_p),
            self._demo_end.ctypes.data_as(ctypes.c_void_p),
            frame_stack, seq_length, batch_size, n_slots, n_threads,
            seed)

        W = frame_stack - 1 + seq_length
        self._out = []
        for k, a in zip(self.keys, self._arrays):
            rows = W if k in self.obs_keys else seq_length
            self._out.append(np.empty((batch_size, rows) + a.shape[1:],
                                      dtype=a.dtype))
        self._idx = np.empty((batch_size,), np.int64)

    def next_batch(self, return_indices: bool = False):
        out_ptrs = (ctypes.c_void_p * len(self._out))(
            *[o.ctypes.data_as(ctypes.c_void_p).value for o in self._out])
        self._lib.wp_next(self._handle, out_ptrs,
                          self._idx.ctypes.data_as(
                              ctypes.POINTER(ctypes.c_int64)))
        batch = {"obs": {}}
        for k, o in zip(self.keys, self._out):
            if k in self.obs_keys:
                batch["obs"][k] = o.copy()
            else:
                batch[k] = o.copy()
        if return_indices:
            return batch, self._idx.copy()
        return batch

    def iter_batches(self) -> Iterator[dict]:
        while True:
            yield self.next_batch()

    def close(self) -> None:
        if getattr(self, "_handle", None):
            self._lib.wp_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:  # noqa: BLE001 — interpreter shutdown
            pass
