"""Device mesh + sharding rules.

The reference does implicit single-host data parallelism: batches are split
over local devices with ``PositionalSharding`` while params stay unsharded
(reference: utils/py_utils.py:27-39, train_bc.py:70-84, where explicit param
replication is commented out "no sharding available"). Here sharding is
first-class and explicit:

- a named ``Mesh`` with axes ``('dp', 'env')`` — ``dp`` shards training batches,
  ``env`` shards rollout environment batches; both default to all devices,
- ``NamedSharding`` rules for batches (shard dim0 on dp), params (fully
  replicated), and env states (shard dim0 on env),
- multi-host entry via ``jax.distributed.initialize`` so the same code scales
  from 1 chip to a pod slice — XLA inserts the grad all-reduce over ICI.

Everything is plain ``jax.sharding``; no custom collectives are needed for DP
because ``jit`` inserts ``psum`` on gradients automatically when inputs are
sharded and params are replicated.
"""

from __future__ import annotations

import os
from typing import Any, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DP_AXIS = "dp"
ENV_AXIS = "env"


def maybe_init_distributed() -> None:
    """Initialize multi-host JAX when launched under a multi-host coordinator.

    No-op on a single host. Controlled by standard JAX envvars
    (JAX_COORDINATOR_ADDRESS / num processes), so single-chip dev flows are
    untouched.
    """
    if os.environ.get("JAX_COORDINATOR_ADDRESS") and jax.process_count() == 1:
        jax.distributed.initialize()


def make_mesh(devices: Sequence[jax.Device] | None = None,
              dp: int | None = None) -> Mesh:
    """1-D data-parallel mesh over all (or given) devices.

    ``dp`` can restrict the axis size (must divide the device count); remaining
    devices are left out (useful for tests).
    """
    devices = list(devices if devices is not None else jax.devices())
    n = dp or len(devices)
    assert len(devices) >= n, f"need {n} devices, have {len(devices)}"
    return Mesh(np.asarray(devices[:n]).reshape(n), (DP_AXIS,))


def make_env_mesh(devices: Sequence[jax.Device] | None = None) -> Mesh:
    """1-D mesh with the rollout 'env' axis over all devices."""
    devices = list(devices if devices is not None else jax.devices())
    return Mesh(np.asarray(devices).reshape(len(devices)), (ENV_AXIS,))


def batch_sharding(mesh: Mesh, axis: str = DP_AXIS) -> NamedSharding:
    """Shard dim 0 across the given mesh axis; replicate the rest."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh, axis: str = DP_AXIS) -> Any:
    """device_put a host batch pytree with dim0 sharded over ``axis``.

    Replacement for the reference's ``py_utils.shard_batch``
    (utils/py_utils.py:27-39). Every leaf's leading dim must be divisible by
    the axis size.
    """
    sharding = batch_sharding(mesh, axis)
    size = mesh.shape[axis]

    def _put(x):
        arr = np.asarray(x)
        assert arr.shape[0] % size == 0, (
            f"leading dim {arr.shape[0]} not divisible by mesh axis {axis}={size}")
        return jax.device_put(arr, sharding)

    return jax.tree_util.tree_map(_put, batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Explicitly replicate a pytree (e.g. params) across the mesh."""
    sharding = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def local_batch_slice(global_batch: int, mesh: Mesh, axis: str = DP_AXIS) -> int:
    size = mesh.shape[axis]
    assert global_batch % size == 0
    return global_batch // size
