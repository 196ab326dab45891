#!/usr/bin/env python
"""Mixed-data BC training driver (expert + suboptimal / action-free).

Parity with the reference train_mixed_bc.py: a second ``mixed_data`` loader
feeds the IDM while the planner trains on the expert/action-free stream
(agent.update_mixed). The action-free ablation is the same config with
``mixed_data`` pointing at the expert latent dataset
(reference train_mixed_bc_actionfree_*.yaml pattern).
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
    cfg = load_config(name or "train_mixed_bc", overrides)
    assert "mixed_data" in cfg, "train_mixed_bc needs a mixed_data group"
    work_dir = Path(cfg.get("experiment_root", "experiments")) / \
        cfg.get("experiment_folder", "default") / cfg.get("experiment_name", "run")
    Workspace(cfg, work_dir).run()


if __name__ == "__main__":
    main()
