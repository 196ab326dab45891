#!/bin/bash
# ALOHA transfer-cube LDP pipeline, round-4 v3 ("phys3").
#
# Identical recipe to run_aloha_phys_pipeline.sh (phys2) EXCEPT the two data
# fixes from the round-4 closed-loop diagnosis (tools/diag_aloha.py):
#
#   1. trim_success_margin=12 — phys2 recorded fixed-length scans (150/250
#      steps) of a ~65-step task: 76% of all training frames were the static
#      post-success hold, so the planner learned persistence plans and the
#      policy stalled at the hover-above-cube phase (plans only 2.7x better
#      than a "nothing moves" baseline; never closed the gripper).
#   2. clean_labels=true on the DART segments — phys2 recorded the EXECUTED
#      noisy actions; a diffusion policy is generative and reproduces that
#      jitter (measured 10x the expert's per-step action delta, fatal inside
#      the 1 cm grasp funnel). True DART: execute noisy, label clean.
#
# Everything else (counts, sigmas, VAE, planner, horizons, steps) unchanged
# so phys2 -> phys3 isolates the data pathology.
set -e
cd "$(dirname "$0")/.."
RUN=${RUN:-aloha_phys3}
STEPS=${STEPS:-60000}
ENV=latent_diffusion_planning_tpu.envs.aloha_cube.AlohaTransferCubeEnv
DATA=datasets/aloha_cube_phys3
SEGS="$DATA/demos.hdf5,$DATA/demos_n3.hdf5,$DATA/demos_n5.hdf5"
LATS="$DATA/demos_latent.hdf5,$DATA/demos_n3_latent.hdf5,$DATA/demos_n5_latent.hdf5"
python tools/collect_demos.py env._target_=$ENV \
  n_episodes=128 episode_len=150 trim_success_margin=12 \
  out_path=$DATA/demos.hdf5 seed=0
python tools/collect_demos.py env._target_=$ENV \
  n_episodes=288 episode_len=250 noise=0.003 noise_hold=10 \
  clean_labels=true trim_success_margin=12 \
  out_path=$DATA/demos_n3.hdf5 seed=1
python tools/collect_demos.py env._target_=$ENV \
  n_episodes=320 episode_len=250 noise=0.005 noise_hold=10 \
  clean_labels=true trim_success_margin=12 \
  out_path=$DATA/demos_n5.hdf5 seed=2
python tools/collect_demos.py env._target_=$ENV \
  n_episodes=32 episode_len=150 trim_success_margin=12 \
  out_path=$DATA/demos_eval.hdf5 seed=77
python tools/train_vae.py data=aloha_cube/wrist \
  "data.train_path=[$SEGS]" \
  data.eval_path=$DATA/demos_eval.hdf5 \
  'model.vae.block_out_channels=[128,128]' model.vae.patch_size=4 \
  model.vae.norm_groups=32 \
  batch_size=64 n_grad_steps=4000 warmup_steps=100 lr=3e-4 \
  eval_every=2000 save_every=2000 \
  experiment_folder=$RUN experiment_name=vae
python tools/process_latents.py vae_snapshot_path=experiments/$RUN/vae/ckpt/4000.ckpt \
  'vae.block_out_channels=[128,128]' vae.patch_size=4 vae.norm_groups=32 \
  'rgb_keys=[wrist64_image]' \
  "src_paths=[$SEGS,$DATA/demos_eval.hdf5]" \
  "dst_paths=[$LATS,$DATA/demos_eval_latent.hdf5]"
python tools/train_bc.py agent=ldp_agent data=aloha_cube/latent_wrist256 \
  "data.train_path=[$SEGS]" "data.train_latent_path=[$LATS]" \
  data.eval_path=$DATA/demos_eval.hdf5 \
  data.eval_latent_path=$DATA/demos_eval_latent.hdf5 \
  'model_vae.block_out_channels=[128,128]' model_vae.patch_size=4 \
  model_vae.norm_groups=32 \
  agent.vae_pretrain_path=experiments/$RUN/vae/ckpt/4000.ckpt \
  agent.vae_feature_dim=256 \
  'agent.planner.down_dims=[128,256,512]' \
  agent.planner_prediction_type=sample \
  agent.planner_n_diffusion_steps=50 agent.idm_n_diffusion_steps=50 \
  agent.planner_inference_steps=25 agent.idm_inference_steps=25 \
  data.env_params.env.episode_len=400 \
  horizon=9 obs_horizon=1 action_horizon=4 pred_horizon=8 batch_size=128 \
  n_grad_steps=$STEPS warmup_steps=500 lr=3e-4 n_eval_episodes=64 \
  eval_every=10000 save_every=5000 \
  experiment_folder=$RUN experiment_name=ldp

python tools/snapshot_run.py experiments/$RUN/vae experiments/$RUN/ldp
