#!/usr/bin/env python
"""Single-dataset BC training driver.

Parity with the reference train_bc.py CLI: ``python tools/train_bc.py
[--config train_bc] agent=ldp_agent data=lift/latent_img key=value ...``.
Config system: latent_diffusion_planning_tpu/utils/config.py (self-contained
hydra replacement).
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from latent_diffusion_planning_tpu.utils.runtime import setup as _setup_runtime
_setup_runtime()

from latent_diffusion_planning_tpu.parallel.mesh import maybe_init_distributed
from latent_diffusion_planning_tpu.train.loop import Workspace
from latent_diffusion_planning_tpu.utils.config import load_config, parse_cli


def main(argv=None) -> None:
    maybe_init_distributed()
    name, overrides = parse_cli(argv if argv is not None else sys.argv[1:])
    cfg = load_config(name or "train_bc", overrides)
    work_dir = Path(cfg.get("experiment_root", "experiments")) / \
        cfg.get("experiment_folder", "default") / cfg.get("experiment_name", "run")
    Workspace(cfg, work_dir).run()


if __name__ == "__main__":
    main()
