#!/usr/bin/env python
"""β-VAE training driver with HTML reconstruction reports.

Parity with the reference train_vae.py: train the KL-VAE on first-frame
camera images; eval computes held-out metrics and writes an HTML page of
reconstructions + prior samples per checkpoint (reference :140-230).
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from latent_diffusion_planning_tpu.utils.runtime import setup as _setup_runtime
_setup_runtime()

import jax
import numpy as np

from latent_diffusion_planning_tpu.train.loop import Workspace
from latent_diffusion_planning_tpu.utils import media
from latent_diffusion_planning_tpu.utils.config import (instantiate,
                                                        load_config, parse_cli)


class VAEWorkspace(Workspace):
    def init_agent(self, init_batch) -> None:
        self.rng, rng = jax.random.split(self.rng)
        self.agent = instantiate(self.cfg.model, rng, init_batch)
        from latent_diffusion_planning_tpu.parallel import mesh as meshlib
        self.agent = meshlib.replicate(self.agent, self.mesh)
        self.logger.note("vae model created")

    def eval(self) -> None:
        model = self.agent
        eval_iter = self.data.eval_dataloader()
        self.rng, rng = jax.random.split(self.rng)
        for _ in range(self.cfg.get("n_eval_batches", 10)):
            batch = next(eval_iter)
            rng, sub = jax.random.split(rng)
            metrics = model.get_metrics(batch, sub)
            self.logger.log_metrics(metrics, self.step, "eval")

        # HTML reconstruction report (parity: train_vae.py:170-228)
        report = media.HTMLReport(f"vae @ step {self.step}")
        batch = next(eval_iter)
        key = model.config.rgb_obs[0]
        originals = np.asarray(batch["obs"][key][:8, 0])
        recons = np.asarray(model.reconstruct(batch)[:8])
        report.add_header("reconstructions (top: input, bottom: recon)")
        report.add_images(list(originals), [f"in {i}" for i in range(8)])
        report.add_images(list(recons), [f"rec {i}" for i in range(8)])
        rng, sub = jax.random.split(rng)
        samples = np.asarray(model.sample(sub, 8))
        report.add_header("prior samples")
        report.add_images(list(samples), [f"z~N(0,1) {i}" for i in range(8)])
        out = report.save(self.work_dir / "html" / f"recon_{self.step}.html")
        self.logger.note(f"wrote {out}")
        self.logger.dump(self.step, "eval")

    def save_snapshot(self) -> None:
        self.ckpt.save_params(self.step, self.agent.get_params())
        if self.cfg.get("save_full_state", True):
            self.ckpt.save_state(self.step, self.agent,
                                 config=self.cfg.to_dict())
        self.logger.note(f"saved snapshot @ {self.step}")


def main(argv=None) -> None:
    name, overrides = parse_cli(argv if argv is not None else sys.argv[1:])
    cfg = load_config(name or "train_vae", overrides)
    work_dir = Path(cfg.get("experiment_root", "experiments")) / \
        cfg.get("experiment_folder", "vae") / cfg.get("experiment_name", "run")
    VAEWorkspace(cfg, work_dir).run()


if __name__ == "__main__":
    main()
