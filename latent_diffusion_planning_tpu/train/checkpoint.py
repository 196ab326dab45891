"""Orbax checkpointing with true full-state resume.

Capability parity + improvement over the reference's snapshot protocol
(train_bc.py:203-240): the reference saves ``{<name>_params, data, cfg}`` and
on restore reinitializes optimizers (losing opt state and step — "resume" is
warm-start only). Here a checkpoint holds the complete agent pytree (params,
optimizer state, EMA, step counters) plus the resolved config JSON, so
training resumes bit-exactly. The reference's key-pattern restore
(``*_params`` rebinding, ``encoder_params`` specialization, ``restore_keys``
filter, ``ema`` skipping — train_bc.py:215-238) is kept for loading
params-only snapshots into freshly-created agents.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Mapping

import jax
import numpy as np
import orbax.checkpoint as ocp


def _to_host(tree: Any) -> Any:
    return jax.tree_util.tree_map(np.asarray, tree)


class Checkpointer:
    """Directory of ``<step>.ckpt`` orbax checkpoints + config sidecars."""

    def __init__(self, directory: str | Path):
        self.directory = Path(directory)
        self.directory.mkdir(parents=True, exist_ok=True)
        self._ckptr = ocp.PyTreeCheckpointer()

    # -- full state ---------------------------------------------------------
    def save_state(self, step: int, agent: Any,
                   config: Mapping | None = None) -> Path:
        """Save the complete agent pytree (resumable).

        Stored as ``<step>.state`` next to the ``<step>.ckpt`` params
        snapshot (same step, two artifacts — full state must not clobber the
        reference-compatible params file)."""
        path = self.directory / f"{step}.state"
        self._ckptr.save(path.resolve(), _to_host(agent), force=True)
        if config is not None:
            (self.directory / f"{step}.config.json").write_text(
                json.dumps(dict(config), default=str))
        return path

    def restore_state(self, path: str | Path, target: Any) -> Any:
        """Restore a full checkpoint into an agent of identical structure."""
        restored = self._ckptr.restore(Path(path).resolve(),
                                       item=_to_host(target))
        return jax.tree_util.tree_map(
            lambda t, r: jax.numpy.asarray(r), target, restored)

    # -- params-only (reference-compatible) ---------------------------------
    def save_params(self, step: int, params: Mapping[str, Any],
                    extra: Mapping[str, Any] | None = None) -> Path:
        """Save a ``{<name>_params: ...}`` dict (agent.get_params())."""
        path = self.directory / f"{step}.ckpt"
        payload = dict(params)
        if extra:
            payload.update(extra)
        self._ckptr.save(path.resolve(), _to_host(payload), force=True)
        return path

    def restore_raw(self, path: str | Path) -> dict:
        return self._ckptr.restore(Path(path).resolve())

    def list_checkpoints(self) -> list[Path]:
        cs = [p for p in self.directory.glob("*.ckpt")]
        return sorted(cs, key=lambda p: int(p.name.split(".")[0]))

    def list_states(self) -> list[Path]:
        cs = [p for p in self.directory.glob("*.state")]
        return sorted(cs, key=lambda p: int(p.name.split(".")[0]))


def apply_params_snapshot(agent: Any, snapshot: Mapping[str, Any],
                          restore_keys: list[str] | None = None) -> Any:
    """Rebind ``*_params`` entries of a snapshot onto agent train states.

    Key protocol parity (train_bc.py:213-238): any key ``<prefix>_params``
    rebinds ``<prefix>_state.params`` (and EMA copy); ``encoder_params`` maps
    onto the per-camera encoder state dict; keys containing ``ema`` are
    skipped; ``restore_keys`` filters which keys apply.
    """
    updates: dict[str, Any] = {}
    for key, value in snapshot.items():
        if "ema" in key:
            continue
        if restore_keys is not None and key not in restore_keys:
            continue
        if not key.endswith("_params"):
            continue
        prefix = key[: -len("_params")]
        if prefix == "encoder" and hasattr(agent, "encoder_states"):
            new_states = {}
            for cam, state in agent.encoder_states.items():
                cam_params = value[f"{cam}_params"]
                new_states[cam] = state.replace(
                    params=cam_params,
                    ema_params=(cam_params if state.ema_params is not None
                                else None))
            updates["encoder_states"] = new_states
            continue
        state_attr = f"{prefix}_state"
        if hasattr(agent, state_attr):
            state = getattr(agent, state_attr)
            if state is None:
                continue
            updates[state_attr] = state.replace(
                params=value,
                ema_params=(value if state.ema_params is not None else None))
        elif prefix == "vae" and hasattr(agent, "vae_params"):
            updates["vae_params"] = value
    return agent.replace(**updates)
