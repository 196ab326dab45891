"""End-to-end Workspace test: config → data → agent → train → eval → ckpt.

Mirrors the CLI drivers (tools/train_bc.py) but inline, tiny, and on CPU —
locks the whole driver layer (config composition, facade instantiation,
training loop cadence, snapshotting, offline+env eval) into CI.
"""

import textwrap

import numpy as np
import pytest

from latent_diffusion_planning_tpu.data import synthetic
from latent_diffusion_planning_tpu.train.loop import Workspace
from latent_diffusion_planning_tpu.utils.config import load_config

pytestmark = pytest.mark.slow  # compile-heavy: run with -m "not slow" for the fast tier

UNET = "latent_diffusion_planning_tpu.models.nets.unet1d.ConditionalUnet1D"
MLPD = "latent_diffusion_planning_tpu.models.nets.mlp.MLPDiffusion"


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    root = tmp_path_factory.mktemp("ws")
    data_dir = root / "data"
    synthetic.write_robomimic_hdf5(data_dir / "train.hdf5", n_demos=4,
                                   demo_len=20,
                                   obs_shapes={"robot0_eef_pos": (3,)},
                                   ac_dim=7, seed=0)
    # 64-dim latents: matches the test VAE (16px, 2 downsamples, 4 channels
    # -> 4*4*4) so live-encoded eval obs and the dataset agree
    synthetic.write_latent_hdf5(data_dir / "lat.hdf5",
                                data_dir / "train.hdf5",
                                ["agentview_image"], latent_dim=64)
    return root


def _cfg(workdir, tmp_path):
    overrides = [
        "agent=ldp_agent", "data=lift/latent_img",
        f"data.train_path={workdir}/data/train.hdf5",
        f"data.eval_path={workdir}/data/train.hdf5",
        f"data.train_latent_path={workdir}/data/lat.hdf5",
        f"data.eval_latent_path={workdir}/data/lat.hdf5",
        "data.eval_n_episode_overfit=4",
        "data.meta.lowdim_obs=[robot0_eef_pos]",
        "data.meta.shape_meta.ac_dim=7",
        "model_vae.block_out_channels=[8,8,8]",
        "model_vae.norm_groups=4", "model_vae.use_mid_attention=false",
        "agent.vae_feature_dim=64",
        "data.meta.shape_meta.all_shapes.latent_agentview_image=[64]",
        "agent.planner.down_dims=[16,32]",
        "agent.idm_net.n_blocks=1", "agent.idm_net.hidden_dim=32",
        "agent.planner_n_diffusion_steps=5", "agent.idm_n_diffusion_steps=5",
        "agent.planner_inference_steps=2", "agent.idm_inference_steps=2",
        "data.env_params.env.episode_len=8",
        "data.env_params.env.image_size=16",
        "horizon=9", "obs_horizon=1", "action_horizon=4", "pred_horizon=8",
        "batch_size=8", "n_grad_steps=4", "log_every=2", "save_every=4",
        "eval_every=100", "warmup_steps=2", "n_eval_episodes=2",
    ]
    return load_config("train_bc", overrides)


def test_workspace_full_cycle(workdir, tmp_path):
    cfg = _cfg(workdir, tmp_path)
    ws = Workspace(cfg, tmp_path / "run")
    ws.run()
    # artifacts: config, csv logs, param ckpt + full state, video
    assert (tmp_path / "run" / "config.yaml").exists()
    assert (tmp_path / "run" / "train.csv").exists()
    ckpts = ws.ckpt.list_checkpoints()
    assert ckpts, "no checkpoints written"
    states = ws.ckpt.list_states()
    assert states, "no full-state checkpoints written"
    # eval csv got env rollout metrics
    import csv
    rows = list(csv.DictReader(open(tmp_path / "run" / "eval.csv")))
    assert "success" in rows[-1]
    assert float(rows[-1]["n_episodes"]) == 2.0

    # warm-start restore path (snapshot -> fresh workspace)
    cfg2 = _cfg(workdir, tmp_path)
    cfg2["snapshot_path"] = str(ckpts[-1])
    cfg2["n_grad_steps"] = 1
    cfg2["n_eval_episodes"] = 0
    ws2 = Workspace(cfg2, tmp_path / "run2")
    ws2.run()
    p1 = ws.agent.planner_state.params
    # ws2 trained 1 step from the restored params — finite and shaped alike
    import jax
    assert jax.tree_util.tree_structure(p1) == jax.tree_util.tree_structure(
        ws2.agent.planner_state.params)

    # full-state resume: same run dir, resume=true picks up at the saved
    # step (params + optimizer + EMA, the crash-recovery path)
    cfg3 = _cfg(workdir, tmp_path)
    cfg3["resume"] = True
    cfg3["n_grad_steps"] = 6
    cfg3["n_eval_episodes"] = 0
    cfg3["eval_every"] = 1000
    ws3 = Workspace(cfg3, tmp_path / "run")
    ws3.run()
    resumed_from = int(states[-1].name.split(".")[0])
    assert ws3.step == 6, ws3.step
    assert resumed_from > 0  # it really had a mid-run state to resume from
    assert int(ws3.ckpt.list_states()[-1].name.split(".")[0]) >= resumed_from
