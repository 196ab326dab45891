#!/usr/bin/env python
"""Offline dataset → latent HDF5 preprocessing.

Parity with the reference process_sdvae_data.py: VAE-encode every frame of
every demo (obs stream + spliced terminal frame) into
``data/demo_i/latent/<rgb_key>``, recording global ``min_z``/``max_z`` attrs
for the latent normalization bounds (reference :55-121). Batches are padded to
a fixed shard size so one jitted encode serves every demo length.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from latent_diffusion_planning_tpu.utils.runtime import setup as _setup_runtime
_setup_runtime()

import h5py
import jax
import jax.numpy as jnp
import numpy as np

from latent_diffusion_planning_tpu.ops import normalize as nz
from latent_diffusion_planning_tpu.train.checkpoint import Checkpointer
from latent_diffusion_planning_tpu.models.vae import KLVAE
from latent_diffusion_planning_tpu.utils.config import (instantiate,
                                                        load_config, parse_cli)


def encode_file(src_path: str, dst_path: str, vae_def: KLVAE, vae_params,
                rgb_keys, image_stats, shard: int = 128) -> tuple[float, float]:
    @jax.jit
    def encode(imgs):
        mean, _ = vae_def.apply({"params": vae_params}, imgs,
                                method=KLVAE.encode)
        return mean.reshape(mean.shape[0], -1)

    min_z, max_z = np.inf, -np.inf
    with h5py.File(src_path, "r") as src, h5py.File(dst_path, "w") as dst:
        data = dst.create_group("data")
        for demo in sorted(src["data"], key=lambda n: int(n.split("_")[-1])):
            g = data.create_group(demo).create_group("latent")
            for key in rgb_keys:
                obs = src[f"data/{demo}/obs/{key}"][:]
                if f"data/{demo}/next_obs/{key}" in src:
                    last = src[f"data/{demo}/next_obs/{key}"][-1:]
                    obs = np.concatenate([obs, last], axis=0)
                frames = nz.normalize_tree(
                    {key: jnp.asarray(obs)},
                    {key: image_stats})[key]
                zs = []
                for i in range(0, len(frames), shard):
                    chunk = frames[i: i + shard]
                    pad = shard - len(chunk)
                    if pad:
                        chunk = jnp.concatenate(
                            [chunk, jnp.repeat(chunk[-1:], pad, axis=0)])
                    z = np.asarray(encode(chunk))
                    zs.append(z[: shard - pad] if pad else z)
                z = np.concatenate(zs, axis=0)
                min_z = min(min_z, float(z.min()))
                max_z = max(max_z, float(z.max()))
                g.create_dataset(key, data=z.astype(np.float32))
        dst["data"].attrs["min_z"] = min_z
        dst["data"].attrs["max_z"] = max_z
    return min_z, max_z


def main(argv=None) -> None:
    name, overrides = parse_cli(argv if argv is not None else sys.argv[1:])
    cfg = load_config(name or "process_latents", overrides)

    ckpt = Checkpointer(Path(cfg.vae_snapshot_path).parent)
    snap = ckpt.restore_raw(cfg.vae_snapshot_path)
    vae_params = snap.get("vae_ema_params") or snap["vae_params"]
    vae_def = KLVAE(**dict(cfg.get("vae", {})))

    rgb_keys = list(cfg.rgb_keys)
    image_stats = {"min": 0, "max": 255}
    for src, dst in zip(cfg.src_paths, cfg.dst_paths):
        lo, hi = encode_file(src, dst, vae_def, vae_params, rgb_keys,
                             image_stats, shard=cfg.get("shard", 128))
        print(f"{src} -> {dst}  min_z={lo:.3f} max_z={hi:.3f}")


if __name__ == "__main__":
    main()
