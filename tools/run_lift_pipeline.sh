#!/bin/bash
# Self-contained LDP pipeline on the device Lift task (the reference's
# 4-stage recipe, README.md: demos -> VAE -> latents -> LDP -> eval).
#
# Round-2 configuration: TPU-first patchified VAE (stride-4 stem — the
# MXU-friendly encoder, models/vae.py), planner [64,128,256] trained DDPM-50
# and evaluated DDIM-25 through the fused Pallas samplers (auto-enabled on
# TPU). The final checkpoint is exported to assets/bench/ for bench.py.
set -e
cd "$(dirname "$0")/.."
RUN=${RUN:-pipeline2}
# stages are idempotent (guarded on their output artifact) so an
# interrupted pipeline resumes cleanly without re-burning chip time
if [ ! -f datasets/lift/demos.hdf5 ]; then
python tools/collect_demos.py n_episodes=256 episode_len=80 out_path=datasets/lift/demos.hdf5 seed=0
fi
if [ ! -f datasets/lift/demos_eval.hdf5 ]; then
python tools/collect_demos.py n_episodes=32 episode_len=80 out_path=datasets/lift/demos_eval.hdf5 seed=77
fi
if [ ! -d experiments/$RUN/vae/ckpt/4000.ckpt ]; then
python tools/train_vae.py data=lift/img \
  data.train_path=datasets/lift/demos.hdf5 data.eval_path=datasets/lift/demos_eval.hdf5 \
  'model.vae.block_out_channels=[64,128,128,128]' model.vae.patch_size=4 \
  model.vae.norm_groups=16 \
  batch_size=64 n_grad_steps=4000 warmup_steps=100 lr=3e-4 \
  eval_every=2000 save_every=2000 \
  experiment_folder=$RUN experiment_name=vae
fi
if [ ! -f datasets/lift/demos_latent.hdf5 ]; then
python tools/process_latents.py vae_snapshot_path=experiments/$RUN/vae/ckpt/4000.ckpt \
  'vae.block_out_channels=[64,128,128,128]' vae.patch_size=4 vae.norm_groups=16 \
  'src_paths=[datasets/lift/demos.hdf5,datasets/lift/demos_eval.hdf5]' \
  'dst_paths=[datasets/lift/demos_latent.hdf5,datasets/lift/demos_eval_latent.hdf5]'
fi
if [ ! -d experiments/$RUN/ldp/ckpt/30000.ckpt ]; then
python tools/train_bc.py agent=ldp_agent data=lift/latent_img \
  'model_vae.block_out_channels=[64,128,128,128]' model_vae.patch_size=4 \
  model_vae.norm_groups=16 \
  agent.vae_pretrain_path=experiments/$RUN/vae/ckpt/4000.ckpt \
  'agent.planner.down_dims=[64,128,256]' \
  agent.planner_n_diffusion_steps=50 agent.idm_n_diffusion_steps=50 \
  agent.planner_inference_steps=25 agent.idm_inference_steps=25 \
  data.env_params.env.episode_len=80 \
  horizon=9 obs_horizon=1 action_horizon=4 pred_horizon=8 batch_size=128 \
  n_grad_steps=30000 warmup_steps=200 lr=3e-4 n_eval_episodes=64 \
  eval_every=10000 save_every=10000 \
  experiment_folder=$RUN experiment_name=ldp
fi
# export for bench.py (headline benchmark loads this trained policy);
# rm first — cp -r into an existing directory would nest instead of replace
mkdir -p assets/bench
rm -rf assets/bench/agent.ckpt
cp experiments/$RUN/ldp/config.yaml assets/bench/config.yaml
cp -r experiments/$RUN/ldp/ckpt/30000.ckpt assets/bench/agent.ckpt
