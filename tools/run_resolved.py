#!/usr/bin/env python
"""Resume/launch a Workspace from a resolved experiment config.yaml.

Usage: python tools/run_resolved.py <experiment_dir> [key=value ...]

The resolved config written at launch (utils/config.py: checkpointed
verbatim) is itself loadable — this re-runs the exact experiment without
reconstructing the override list, the reference's
``hydra.run.dir``-restore analogue (train_bc.py snapshot restore).
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from latent_diffusion_planning_tpu.utils.runtime import setup as _setup_runtime
_setup_runtime()

from latent_diffusion_planning_tpu.parallel.mesh import maybe_init_distributed
from latent_diffusion_planning_tpu.train.loop import Workspace
from latent_diffusion_planning_tpu.utils.config import load_config


def main() -> None:
    maybe_init_distributed()
    run_dir = Path(sys.argv[1])
    cfg = load_config("config", sys.argv[2:], config_root=run_dir)
    Workspace(cfg, run_dir).run()


if __name__ == "__main__":
    main()
