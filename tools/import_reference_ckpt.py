#!/usr/bin/env python
"""Import reference-trained checkpoints into this framework.

Converts parameter snapshots saved by the reference implementation
(amberxie88/latent_diffusion_planning) into this framework's snapshot format
(train/checkpoint.py `*_params` protocol), so reference-trained policies and
VAEs run on the TPU stack directly:

  python tools/import_reference_ckpt.py \\
      src=/path/to/reference/ckpt/500000.ckpt dst=imported/agent.ckpt \\
      'planner_down_dims=[256,512,1024]'

Handles:
- agent snapshots: ``planner_params`` (networks/diffusion_nets_v2
  ConditionalUnet1D naming) and ``idm_params`` (networks/mlp_diffusion_nets
  MLPDiffusion — identical flax naming) — mapped via train/transfer.py and
  golden-tested against recorded reference activations,
- VAE checkpoints: ``vae_params``/``vae_ema_params`` holding a
  diffusers.FlaxAutoencoderKL pytree (the reference's StableVAEModel wraps
  one, model/stable_vae_model.py) — use the resulting params with
  ``KLVAE(downsample_pad='diffusers')``,
- raw HuggingFace flax msgpack files (``flax_model.msgpack``) for hub VAEs
  (reference agent/ldp_agent.py:543-554 loads either source).
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from latent_diffusion_planning_tpu.utils.runtime import setup as _setup_runtime
_setup_runtime()

from latent_diffusion_planning_tpu.train import transfer
from latent_diffusion_planning_tpu.train.checkpoint import Checkpointer
from latent_diffusion_planning_tpu.utils.config import parse_cli


def _looks_like_diffusers_vae(tree) -> bool:
    return isinstance(tree, dict) and {"encoder", "decoder"} <= set(tree)


def convert(snapshot: dict, planner_down_dims, block_out_channels,
            layers_per_block: int = 2) -> dict:
    """Map a reference snapshot's param trees into this framework's naming.

    Planner/IDM EMA trees are skipped — the reference's own restore protocol
    copies plain params into ema on load (train_bc.py:230-238), so they carry
    no extra information. VAE EMA trees are the opposite: the reference's
    StableVAEModel *encodes datasets with ema_params*
    (model/stable_vae_model.py reconstruct :89-100), so when a snapshot holds
    both, the EMA tree becomes our ``vae_params`` (ADVICE r2).
    """
    out = {}
    vae_trees: dict[bool, dict] = {}  # is_ema -> mapped tree

    def _map_vae(tree):
        return transfer.map_diffusers_vae_params(
            tree, block_out_channels, layers_per_block)

    for key, tree in snapshot.items():
        if key in ("cfg", "data"):
            continue
        is_ema = "ema" in key
        if _looks_like_diffusers_vae(tree):
            vae_trees[is_ema] = _map_vae(tree)
            continue
        if key.endswith("_params") and isinstance(tree, dict) and \
                _looks_like_diffusers_vae(tree.get("params", {})):
            vae_trees[is_ema] = _map_vae(tree["params"])
            continue
        if is_ema:
            continue  # planner/idm ema: reference restore skips these too
        if key == "planner_params":
            out[key] = transfer.map_unet1d_params(tree, planner_down_dims)
        elif key == "idm_params":
            out[key] = transfer.map_mlp_diffusion_params(tree)
        elif key.endswith("_params"):
            print(f"[import] passing through unrecognized {key}")
            out[key] = tree
    if vae_trees:
        if True in vae_trees:
            print("[import] using VAE EMA params (reference encodes with "
                  "ema_params)")
        out["vae_params"] = vae_trees.get(True, vae_trees.get(False))
    return out


def main(argv=None) -> None:
    args = dict(a.split("=", 1) for a in (argv or sys.argv[1:]))
    src = Path(args["src"])
    dst = Path(args.get("dst", "imported_ckpt"))
    down_dims = eval(args.get("planner_down_dims", "[256, 512, 1024]"))  # noqa: S307
    block_out = eval(args.get(  # noqa: S307
        "vae_block_out_channels", "[128, 256, 256, 256, 256, 256]"))

    if src.suffix == ".msgpack" or src.name.endswith("msgpack"):
        import flax.serialization
        tree = flax.serialization.msgpack_restore(src.read_bytes())
        tree = tree.get("params", tree)
        snapshot = {"vae": tree} if _looks_like_diffusers_vae(tree) else tree
    else:
        snapshot = Checkpointer(src.parent).restore_raw(src)

    converted = convert(snapshot, down_dims, block_out)
    ck = Checkpointer(dst.parent if dst.suffix else dst)
    path = ck.save_params(0, converted)
    final = dst if dst.suffix else dst / "0.ckpt"
    if dst.suffix:
        import shutil
        if final.exists():
            shutil.rmtree(final)
        shutil.move(str(path), str(final))
    print(f"[import] wrote {sorted(converted)} -> {final}")


if __name__ == "__main__":
    main()
