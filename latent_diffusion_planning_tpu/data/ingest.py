"""HDF5 dataset ingest: weld demos into flat arrays + demo index maps.

Capability parity with the reference's dataset constructors
(data/robomimic_data.py:41-95, data/alohasim_data.py, and their *latent*
variants): robomimic files hold ``data/demo_i/{obs,next_obs,actions}`` with the
final ``next_obs`` frame spliced on and a dummy trailing action; ALOHA files
hold ``data/demo_i/{obs,action}`` with no splice; latent companion files hold
``data/demo_i/latent/<rgb_key>`` read as obs key ``latent_<rgb_key>``; an
``optimal`` obs flag is synthesized per dataset; ``n_demos`` caps loading
("n_overfit") and may be an explicit demo-name list.

The welded result is plain numpy, ready to be device_put once into HBM for
fully on-device window sampling (see windows.py) — the torch DataLoader worker
fleet of the reference is replaced by a single gather inside the train step.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Any, Mapping, Sequence

import h5py
import numpy as np


@dataclasses.dataclass
class WeldedDemos:
    """Flat arrays over all demos + per-demo extents."""

    arrays: dict[str, np.ndarray]          # key -> (N_total, ...)
    demo_starts: np.ndarray                # (D,) start index of each demo
    demo_lengths: np.ndarray               # (D,) length of each demo
    obs_keys: tuple[str, ...]
    dataset_keys: tuple[str, ...]          # non-obs keys (actions)
    env_meta: dict[str, Any] | None = None
    name: str = ""

    @property
    def n_demos(self) -> int:
        return len(self.demo_starts)

    @property
    def total_steps(self) -> int:
        return int(self.demo_lengths.sum())

    def demo_slice(self, i: int) -> dict[str, np.ndarray]:
        s = int(self.demo_starts[i])
        e = s + int(self.demo_lengths[i])
        return {k: v[s:e] for k, v in self.arrays.items()}


def _sorted_demo_names(f: h5py.File) -> list[str]:
    names = list(f["data"].keys())
    return sorted(names, key=lambda n: int(n.split("_")[-1]))


def _select_demos(names: list[str], n_demos) -> list[str]:
    if n_demos is None:
        return names
    if isinstance(n_demos, (list, tuple)):
        missing = set(n_demos) - set(names)
        assert not missing, f"demo names not in file: {sorted(missing)}"
        return list(n_demos)
    assert n_demos <= len(names), (
        f"requested {n_demos} demos, file has {len(names)}")
    return names[:n_demos]


def load_robomimic(path: str, obs_keys: Sequence[str],
                   n_demos: int | Sequence[str] | None = None,
                   latent_path: str | None = None,
                   optimal: float = 1.0,
                   name: str = "") -> WeldedDemos:
    """Load + weld a robomimic-format HDF5 (with optional latent companion).

    Per demo the obs stream gains one final frame from ``next_obs`` and the
    action stream a duplicated trailing action, so every state (including the
    terminal one) is indexable — parity with reference weld_demos
    (data/robomimic_data.py:73-95).
    """
    obs_keys = tuple(obs_keys)
    lat = h5py.File(latent_path, "r") if latent_path else None
    out: dict[str, list[np.ndarray]] = {k: [] for k in obs_keys}
    out["actions"] = []
    starts, lengths = [], []
    total = 0
    with h5py.File(path, "r", swmr=True, libver="latest") as f:
        demos = _select_demos(_sorted_demo_names(f), n_demos)
        env_meta = (json.loads(f["data"].attrs["env_args"])
                    if "env_args" in f["data"].attrs else None)
        for demo in demos:
            g = f[f"data/{demo}"]
            T = int(g.attrs["num_samples"]) + 1  # + spliced terminal frame
            for key in obs_keys:
                if key == "optimal":
                    arr = np.full((T, 1), optimal, dtype=np.float32)
                elif key.startswith("latent_"):
                    src = key[len("latent_"):]
                    assert lat is not None, (
                        f"obs key {key} needs latent_path")
                    arr = lat[f"data/{demo}/latent/{src}"][:]
                    assert len(arr) == T, (
                        f"latent stream for {demo}/{src} has {len(arr)} frames,"
                        f" expected {T} (obs + spliced terminal)")
                else:
                    obs = g[f"obs/{key}"][:]
                    last = g[f"next_obs/{key}"][-1:]
                    arr = np.concatenate([obs, last], axis=0)
                out[key].append(arr)
            actions = g["actions"][:]
            out["actions"].append(
                np.concatenate([actions, actions[-1:]], axis=0))
            starts.append(total)
            lengths.append(T)
            total += T
    if lat is not None:
        lat.close()
    arrays = {k: np.concatenate(v, axis=0) for k, v in out.items()}
    return WeldedDemos(arrays=arrays,
                       demo_starts=np.asarray(starts, np.int64),
                       demo_lengths=np.asarray(lengths, np.int64),
                       obs_keys=obs_keys, dataset_keys=("actions",),
                       env_meta=env_meta, name=name)


def load_aloha(path: str, obs_keys: Sequence[str],
               n_demos: int | Sequence[str] | None = None,
               latent_path: str | None = None,
               optimal: float = 1.0,
               name: str = "") -> WeldedDemos:
    """Load + weld an ALOHA-format HDF5 (no next_obs splice; action key may be
    singular). Parity: data/alohasim_data.py."""
    obs_keys = tuple(obs_keys)
    lat = h5py.File(latent_path, "r") if latent_path else None
    out: dict[str, list[np.ndarray]] = {k: [] for k in obs_keys}
    out["actions"] = []
    starts, lengths = [], []
    total = 0
    with h5py.File(path, "r", swmr=True, libver="latest") as f:
        demos = _select_demos(_sorted_demo_names(f), n_demos)
        for demo in demos:
            g = f[f"data/{demo}"]
            act_key = "actions" if "actions" in g else "action"
            actions = g[act_key][:]
            T = int(g.attrs.get("num_samples", len(actions)))
            for key in obs_keys:
                if key == "optimal":
                    arr = np.full((T, 1), optimal, dtype=np.float32)
                elif key.startswith("latent_"):
                    src = key[len("latent_"):]
                    assert lat is not None
                    arr = lat[f"data/{demo}/latent/{src}"][:T]
                else:
                    arr = g[f"obs/{key}"][:T]
                out[key].append(arr)
            out["actions"].append(actions[:T])
            starts.append(total)
            lengths.append(T)
            total += T
    if lat is not None:
        lat.close()
    arrays = {k: np.concatenate(v, axis=0) for k, v in out.items()}
    return WeldedDemos(arrays=arrays,
                       demo_starts=np.asarray(starts, np.int64),
                       demo_lengths=np.asarray(lengths, np.int64),
                       obs_keys=obs_keys, dataset_keys=("actions",),
                       env_meta=None, name=name)


def concat_welded(parts: Sequence[WeldedDemos], name: str = "") -> WeldedDemos:
    """Concatenate several welded datasets (for mixed-quality sampling)."""
    assert parts, "need at least one dataset"
    keys = parts[0].arrays.keys()
    for p in parts[1:]:
        assert p.arrays.keys() == keys, "mixed datasets must share keys"
    arrays = {k: np.concatenate([p.arrays[k] for p in parts], axis=0)
              for k in keys}
    starts, lengths = [], []
    offset = 0
    for p in parts:
        starts.append(p.demo_starts + offset)
        lengths.append(p.demo_lengths)
        offset += p.total_steps
    return WeldedDemos(arrays=arrays,
                       demo_starts=np.concatenate(starts),
                       demo_lengths=np.concatenate(lengths),
                       obs_keys=parts[0].obs_keys,
                       dataset_keys=parts[0].dataset_keys,
                       env_meta=parts[0].env_meta, name=name)
