#!/usr/bin/env python
"""Export a repo-trained checkpoint into the reference's parameter naming.

The inverse of tools/import_reference_ckpt.py: takes an agent snapshot saved
by this framework (train/checkpoint.py ``*_params`` protocol) and rewrites
each tree into the flax auto-naming the reference implementation
(amberxie88/latent_diffusion_planning) produces, so the result restores
through the reference's own checkpoint protocol (reference train_bc.py:210-240
rebinds any ``<prefix>_params`` key onto ``<prefix>_state.params``):

  python tools/export_reference_ckpt.py \\
      src=assets/bench/agent.ckpt dst=exported/ref_agent.ckpt \\
      'planner_down_dims=[64,128,256]'

- ``planner_params`` → networks/diffusion_nets_v2.ConditionalUnet1D naming
- ``idm_params``     → networks/mlp_diffusion_nets.MLPDiffusion (identical)
- ``vae_params``     → diffusers FlaxAutoencoderKL naming when
  ``export_vae=true`` and the VAE is reference-shaped (patch_size=1);
  otherwise dropped — reference *agent* snapshots carry no VAE tree (the VAE
  loads from its own checkpoint at create, reference agent/ldp_agent.py:543-554).

Round-trip guarantee: import_reference_ckpt.convert() on the exported
snapshot reproduces the source trees bit-exactly (tests/test_transfer.py).
"""

import ast
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from latent_diffusion_planning_tpu.utils.runtime import setup as _setup_runtime
_setup_runtime()

from latent_diffusion_planning_tpu.train import transfer
from latent_diffusion_planning_tpu.train.checkpoint import Checkpointer


def export(snapshot: dict, planner_down_dims, block_out_channels=None,
           layers_per_block: int = 2, export_vae: bool = False) -> dict:
    out = {}
    for key, tree in snapshot.items():
        if key in ("cfg", "data") or "ema" in key:
            continue
        if key == "planner_params":
            out[key] = transfer.export_unet1d_params(tree, planner_down_dims)
        elif key == "idm_params":
            out[key] = transfer.export_mlp_diffusion_params(tree)
        elif key == "vae_params":
            if export_vae:
                out[key] = transfer.export_diffusers_vae_params(
                    tree, block_out_channels, layers_per_block)
        elif key.endswith("_params"):
            print(f"[export] passing through unrecognized {key}")
            out[key] = tree
    return out


def main(argv=None) -> None:
    args = dict(a.split("=", 1) for a in (argv or sys.argv[1:]))
    src = Path(args["src"])
    dst = Path(args.get("dst", "exported_ckpt"))
    down_dims = ast.literal_eval(args.get("planner_down_dims",
                                          "[256, 512, 1024]"))
    block_out = ast.literal_eval(args.get("vae_block_out_channels", "None"))
    export_vae = args.get("export_vae", "false").lower() == "true"

    snapshot = Checkpointer(src.parent).restore_raw(src)
    exported = export(snapshot, down_dims, block_out,
                      export_vae=export_vae)
    ck = Checkpointer(dst.parent if dst.suffix else dst)
    path = ck.save_params(0, exported)
    final = dst if dst.suffix else dst / "0.ckpt"
    if dst.suffix:
        import shutil
        if final.exists():
            shutil.rmtree(final)
        shutil.move(str(path), str(final))
    print(f"[export] wrote {sorted(exported)} -> {final}")


if __name__ == "__main__":
    main()
