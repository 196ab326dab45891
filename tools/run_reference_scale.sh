#!/bin/bash
# Reference-scale recipe proof (VERDICT r3 #10): the flagship configuration —
# reference-shape VAE (stable_vae_model.yaml: 6 stages,
# [128,256,256,256,256,256], 2x2x4=16-dim latent, patch_size=1) and the
# reference-capacity [256,512,1024] planner U-Net at DDPM-100 / batch 256
# (reference train_bc.yaml:10-17 modulo total steps) — trained on Lift
# latents for 100k steps. The [256,512,1024] U-Net exceeds the 72 MB fused-
# sampler VMEM budget (models/agents/ldp.py resolve_fused), so eval runs the
# XLA-scan sampler path — that is the point: the framework must sustain the
# flagship config end to end, not only the throughput-tuned small recipe.
#
# Prereq: datasets/lift/demos*.hdf5 (tools/run_lift_pipeline.sh stage 1).
# Stages are idempotent; safe to rerun with resume semantics.
set -e
cd "$(dirname "$0")/.."
RUN=${RUN:-ref_scale}
STEPS=${STEPS:-100000}
DATA=datasets/lift

if [ ! -d experiments/$RUN/vae/ckpt/8000.ckpt ]; then
python tools/train_vae.py data=lift/img \
  data.train_path=$DATA/demos.hdf5 data.eval_path=$DATA/demos_eval.hdf5 \
  'model.vae.block_out_channels=[128,256,256,256,256,256]' \
  model.vae.patch_size=1 model.vae.norm_groups=32 \
  batch_size=64 n_grad_steps=8000 warmup_steps=200 lr=3e-4 \
  eval_every=4000 save_every=4000 \
  experiment_folder=$RUN experiment_name=vae
python tools/snapshot_run.py experiments/$RUN/vae
fi
if [ ! -f $DATA/demos_latent_ref.hdf5 ]; then
python tools/process_latents.py vae_snapshot_path=experiments/$RUN/vae/ckpt/8000.ckpt \
  'vae.block_out_channels=[128,256,256,256,256,256]' vae.patch_size=1 \
  vae.norm_groups=32 \
  'src_paths=['$DATA'/demos.hdf5,'$DATA'/demos_eval.hdf5]' \
  'dst_paths=['$DATA'/demos_latent_ref.hdf5,'$DATA'/demos_eval_latent_ref.hdf5]'
fi
python tools/train_bc.py agent=ldp_agent data=lift/latent_img \
  data.train_latent_path=$DATA/demos_latent_ref.hdf5 \
  data.eval_latent_path=$DATA/demos_eval_latent_ref.hdf5 \
  'model_vae.block_out_channels=[128,256,256,256,256,256]' \
  model_vae.patch_size=1 model_vae.norm_groups=32 \
  agent.vae_pretrain_path=experiments/$RUN/vae/ckpt/8000.ckpt \
  'agent.planner.down_dims=[256,512,1024]' \
  agent.planner_n_diffusion_steps=100 agent.idm_n_diffusion_steps=100 \
  agent.planner_inference_steps=25 agent.idm_inference_steps=25 \
  'data.stats_from_data=[latent_agentview_image]' \
  data.env_params.env.episode_len=80 \
  horizon=9 obs_horizon=1 action_horizon=4 pred_horizon=8 batch_size=256 \
  n_grad_steps=$STEPS warmup_steps=1000 lr=1e-4 n_eval_episodes=256 \
  eval_every=10000 save_every=10000 resume=true \
  experiment_folder=$RUN experiment_name=ldp
python tools/snapshot_run.py experiments/$RUN/ldp
