"""Robomimic-format HDF5 trajectory writer.

Turns device-collected rollouts (rollout/engine.py collection outputs) into
the on-disk schema the data layer and the reference consume:
``data/demo_i/{obs/<k>, next_obs/<k>, actions, rewards, dones}`` with
``num_samples`` attrs and a JSON ``env_args`` attribute — parity with the
reference's collection writers (utils/rm_env_utils.py:311-327 incl.
successful_only / unsuccessful_only filtering, utils/aloha_env_utils.py:
283-295).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Mapping

import h5py
import numpy as np


def write_trajectories(path: str | Path, collection: Mapping[str, Any], *,
                       env_meta: Mapping[str, Any] | None = None,
                       successful_only: bool = False,
                       unsuccessful_only: bool = False,
                       max_demos: int | None = None,
                       trim_success_margin: int | None = None,
                       image_keys: tuple[str, ...] = ()) -> int:
    """Write collected episodes; returns the number of demos written.

    ``collection`` holds first_obs {k: (N, ...)}, obs {k: (N, T, ...)},
    actions (N, T, A), rewards (N, T), success (N, T).

    Any obs key ending in ``_image`` (plus explicit ``image_keys``) is
    stored uint8 like the reference's recorded datasets — at the 480x640
    viz-camera resolutions float32 storage would 4x every demo file.

    ``trim_success_margin``: cut each successful episode ``margin`` steps
    after its FIRST success instead of storing the full rectangular rollout.
    Device collection runs fixed-length scans (no early stop), so a 65-step
    task recorded at 250 steps is 74% static terminal-hold frames — a
    uniform window sampler then trains mostly on "hold still", and the
    planner learns persistence plans (the round-4 ALOHA stall-at-hover
    failure). The reference never faced this because its demos end at the
    episode cap the expert was tuned to (aloha_constants.py episode_len).
    """
    assert not (successful_only and unsuccessful_only)
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)

    success_ep = np.asarray(collection["success"]).any(axis=1)
    keep = np.ones_like(success_ep, bool)
    if successful_only:
        keep = success_ep
    if unsuccessful_only:
        keep = ~success_ep
    idxs = np.nonzero(keep)[0]
    if max_demos is not None:
        idxs = idxs[:max_demos]

    obs = collection["obs"]
    first = collection["first_obs"]
    actions = np.asarray(collection["actions"])
    rewards = np.asarray(collection["rewards"])
    success = np.asarray(collection["success"])

    with h5py.File(path, "w") as f:
        data = f.create_group("data")
        data.attrs["env_args"] = json.dumps(env_meta or {})
        for d, i in enumerate(idxs):
            g = data.create_group(f"demo_{d}")
            T = actions.shape[1]
            if trim_success_margin is not None and success[i].any():
                T = min(T, int(np.argmax(success[i])) + 1
                        + int(trim_success_margin))
            g.attrs["num_samples"] = T
            obs_g = g.create_group("obs")
            next_g = g.create_group("next_obs")
            for k in obs:
                stream_next = np.asarray(obs[k][i][:T])      # (T, ...)
                stream_obs = np.concatenate(
                    [np.asarray(first[k][i])[None], stream_next[:-1]], axis=0)
                if k in image_keys or (k.endswith("_image")
                                       and not k.startswith("latent_")):
                    stream_obs = np.clip(stream_obs, 0, 255).astype(np.uint8)
                    stream_next = np.clip(stream_next, 0, 255).astype(np.uint8)
                obs_g.create_dataset(k, data=stream_obs)
                next_g.create_dataset(k, data=stream_next)
            g.create_dataset("actions", data=actions[i][:T].astype(np.float32))
            g.create_dataset("rewards", data=rewards[i][:T].astype(np.float32))
            g.create_dataset("dones", data=success[i][:T].astype(np.int64))
    return len(idxs)
