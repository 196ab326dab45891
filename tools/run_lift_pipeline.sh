#!/bin/bash
# Self-contained LDP pipeline on the device Lift task (the reference's
# 4-stage recipe, README.md: demos -> VAE -> latents -> LDP -> eval).
# Sizes here are the mini configuration used for the round-1 smoke run;
# scale n_grad_steps / network dims for real training.
set -e
cd "$(dirname "$0")/.."
python tools/collect_demos.py n_episodes=64 episode_len=80 out_path=datasets/lift/demos.hdf5 seed=0
python tools/collect_demos.py n_episodes=16 episode_len=80 out_path=datasets/lift/demos_eval.hdf5 seed=77
python tools/train_vae.py data=lift/img \
  data.train_path=datasets/lift/demos.hdf5 data.eval_path=datasets/lift/demos_eval.hdf5 \
  'model.vae.block_out_channels=[32,64,64,64,64,64]' model.vae.norm_groups=16 \
  batch_size=64 n_grad_steps=3000 warmup_steps=100 lr=3e-4 \
  experiment_folder=pipeline experiment_name=vae
python tools/process_latents.py vae_snapshot_path=experiments/pipeline/vae/ckpt/3000.ckpt \
  'vae.block_out_channels=[32,64,64,64,64,64]' vae.norm_groups=16 \
  'src_paths=[datasets/lift/demos.hdf5,datasets/lift/demos_eval.hdf5]' \
  'dst_paths=[datasets/lift/demos_latent.hdf5,datasets/lift/demos_eval_latent.hdf5]'
python tools/train_bc.py agent=ldp_agent data=lift/latent_img \
  'model_vae.block_out_channels=[32,64,64,64,64,64]' model_vae.norm_groups=16 \
  agent.vae_pretrain_path=experiments/pipeline/vae/ckpt/3000.ckpt \
  'agent.planner.down_dims=[64,128,256]' \
  agent.planner_n_diffusion_steps=50 agent.idm_n_diffusion_steps=50 \
  agent.planner_inference_steps=25 agent.idm_inference_steps=25 \
  data.env_params.env.episode_len=80 \
  horizon=9 obs_horizon=1 action_horizon=4 pred_horizon=8 batch_size=128 \
  n_grad_steps=20000 warmup_steps=200 lr=3e-4 n_eval_episodes=64 \
  experiment_folder=pipeline experiment_name=ldp
