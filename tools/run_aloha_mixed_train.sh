#!/bin/bash
# ALOHA transfer-cube LDP with SPLIT data streams (the LDP method proper,
# reference train_mixed_bc.py stream semantics, agent/ldp_agent.py:184-227):
#   planner <- clean expert demos only (fast, direct transfers)
#   IDM     <- clean + DART noise-injected mixture (recovery coverage)
#
# Rationale (round-4 measurement): training BOTH modules on the 87%-noisy
# DART mixture (run aloha_phys2) collapsed closed-loop reward 3.5 -> 0.4 at
# 30k — the planner imitates the dithery noisy timelines and never reaches
# the cube (eval videos: cube never enters the wrist view). The planner
# must imitate only the clean timeline; the noisy data is (s, s') -> a
# supervision for the IDM, which is exactly what update_mixed feeds it.
#
# Reuses the aloha_phys2 VAE + latent artifacts (no recollection).
set -e
cd "$(dirname "$0")/.."
RUN=${RUN:-aloha_mixed}
STEPS=${STEPS:-60000}
DATA=datasets/aloha_cube_phys2
SEGS="$DATA/demos.hdf5,$DATA/demos_n3.hdf5,$DATA/demos_n5.hdf5"
LATS="$DATA/demos_latent.hdf5,$DATA/demos_n3_latent.hdf5,$DATA/demos_n5_latent.hdf5"
VAE=experiments/aloha_phys2/vae/ckpt/4000.ckpt

python tools/train_mixed_bc.py agent=ldp_agent data=aloha_cube/latent_wrist256 \
  data.train_path=$DATA/demos.hdf5 data.train_latent_path=$DATA/demos_latent.hdf5 \
  data.eval_path=$DATA/demos_eval.hdf5 \
  data.eval_latent_path=$DATA/demos_eval_latent.hdf5 \
  mixed_data=aloha_cube/latent_wrist256 \
  "mixed_data.train_path=[$SEGS]" "mixed_data.train_latent_path=[$LATS]" \
  mixed_data.eval_path=$DATA/demos_eval.hdf5 \
  mixed_data.eval_latent_path=$DATA/demos_eval_latent.hdf5 \
  'model_vae.block_out_channels=[128,128]' model_vae.patch_size=4 \
  model_vae.norm_groups=32 \
  agent.vae_pretrain_path=$VAE \
  agent.vae_feature_dim=256 \
  'agent.planner.down_dims=[128,256,512]' \
  agent.planner_prediction_type=sample \
  agent.planner_n_diffusion_steps=50 agent.idm_n_diffusion_steps=50 \
  agent.planner_inference_steps=25 agent.idm_inference_steps=25 \
  data.env_params.env.episode_len=400 \
  horizon=9 obs_horizon=1 action_horizon=4 pred_horizon=8 batch_size=128 \
  n_grad_steps=$STEPS warmup_steps=500 lr=3e-4 n_eval_episodes=64 \
  eval_every=10000 save_every=10000 \
  experiment_folder=$RUN experiment_name=ldp

python tools/snapshot_run.py experiments/$RUN/ldp
