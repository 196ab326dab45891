"""Synthetic robomimic-format dataset writers (tests + self-contained demos).

The reference has no test data generator; its pipelines assume externally
downloaded robomimic/ALOHA HDF5s (README.md:44). These helpers write files in
the exact on-disk schema the ingest layer (and the reference) expect:
``data/demo_i/{obs/<key>, next_obs/<key>, actions}`` with ``num_samples`` attrs
and a JSON ``env_args`` attribute on ``data``.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Mapping, Sequence

import h5py
import numpy as np


def write_robomimic_hdf5(path: str | Path, *, n_demos: int = 3,
                         demo_len: int = 20,
                         obs_shapes: Mapping[str, Sequence[int]] | None = None,
                         ac_dim: int = 7, seed: int = 0,
                         env_name: str = "SyntheticLift",
                         image_keys: Sequence[str] = ()) -> Path:
    """Write a robomimic-format HDF5 of smooth random trajectories."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(seed)
    obs_shapes = dict(obs_shapes or {"robot0_eef_pos": (3,)})

    with h5py.File(path, "w") as f:
        data = f.create_group("data")
        data.attrs["env_args"] = json.dumps(
            {"env_name": env_name, "type": 1, "env_kwargs": {}})
        for d in range(n_demos):
            g = data.create_group(f"demo_{d}")
            T = demo_len
            g.attrs["num_samples"] = T
            obs_g = g.create_group("obs")
            next_g = g.create_group("next_obs")
            for key, shape in obs_shapes.items():
                if key in image_keys:
                    stream = rng.integers(
                        0, 256, size=(T + 1,) + tuple(shape), dtype=np.uint8)
                else:
                    # smooth random walk, bounded
                    steps = rng.normal(0, 0.05, size=(T + 1,) + tuple(shape))
                    stream = np.tanh(np.cumsum(steps, axis=0)).astype(np.float32)
                obs_g.create_dataset(key, data=stream[:T])
                next_g.create_dataset(key, data=stream[1:])
            actions = np.clip(rng.normal(0, 0.3, size=(T, ac_dim)), -1, 1)
            g.create_dataset("actions", data=actions.astype(np.float32))
    return path


def write_latent_hdf5(path: str | Path, source_path: str | Path,
                      rgb_keys: Sequence[str], latent_dim: int = 16,
                      seed: int = 0) -> Path:
    """Write a latent companion file with random latents per source frame.

    Real latents come from tools/process_latents.py; this generator produces
    schema-correct files for tests (``data/demo_i/latent/<key>`` with
    demo_len + 1 frames, matching the obs + spliced-terminal convention).
    """
    path = Path(path)
    rng = np.random.default_rng(seed)
    with h5py.File(source_path, "r") as src, h5py.File(path, "w") as f:
        data = f.create_group("data")
        for demo in src["data"]:
            T = int(src[f"data/{demo}"].attrs["num_samples"])
            g = data.create_group(demo).create_group("latent")
            for key in rgb_keys:
                g.create_dataset(key, data=rng.normal(
                    0, 1, size=(T + 1, latent_dim)).astype(np.float32))
    return path


def synthetic_stats(obs_shapes: Mapping[str, Sequence[int]],
                    latent_keys: Sequence[str] = (),
                    image_keys: Sequence[str] = ()) -> dict:
    """Min/max normalization config matching write_robomimic_hdf5 outputs."""
    obs: dict = {}
    for key, shape in obs_shapes.items():
        if key in image_keys:
            obs[key] = {"min": 0, "max": 255}
        else:
            obs[key] = {"min": [-1.0] * int(np.prod(shape)),
                        "max": [1.0] * int(np.prod(shape))}
    for key in latent_keys:
        obs[key] = {"min": -5.0, "max": 5.0}
    obs["optimal"] = {"min": 0, "max": 1}
    return {"obs": obs, "actions": {"clip_min": -1, "clip_max": 1}}
