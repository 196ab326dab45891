#!/bin/bash
# ALOHA bimanual peg-insertion LDP pipeline end-to-end (VERDICT r4 item 8 —
# the last env-coverage partial). Reference surface:
# collect_aloha_scripted_demos.py:110-152 (scripted insertion collection) +
# envs/alohasim_env.py:192-229 (InsertionTask reward ladder) +
# data/cfg/aloha_insertion/**.
#
# Recipe mirrors the transfer-cube phys4 pipeline (256-dim wrist latents,
# [128,256,512] sample-prediction planner, gripper loss weighting + event
# oversampling) at a reduced 60k budget — the goal here is an honest
# end-to-end number at 256 episodes, not a tuned ceiling.
set -e
cd "$(dirname "$0")/.."
RUN=${RUN:-aloha_insertion}
STEPS=${STEPS:-60000}
ENV=latent_diffusion_planning_tpu.envs.aloha_insertion.AlohaInsertionEnv
DATA=datasets/aloha_insertion
SEGS="$DATA/demos.hdf5,$DATA/demos_n3.hdf5"
LATS="$DATA/demos_latent.hdf5,$DATA/demos_n3_latent.hdf5"

if [ ! -f $DATA/demos_eval.hdf5 ]; then
python tools/collect_demos.py env._target_=$ENV \
  n_episodes=128 episode_len=200 trim_success_margin=12 \
  out_path=$DATA/demos.hdf5 seed=0
python tools/collect_demos.py env._target_=$ENV \
  n_episodes=256 episode_len=250 noise=0.003 noise_hold=10 \
  clean_labels=true trim_success_margin=12 \
  out_path=$DATA/demos_n3.hdf5 seed=1
python tools/collect_demos.py env._target_=$ENV \
  n_episodes=32 episode_len=200 trim_success_margin=12 \
  out_path=$DATA/demos_eval.hdf5 seed=77
fi

if [ ! -d experiments/$RUN/vae/ckpt/4000.ckpt ]; then
python tools/train_vae.py data=aloha_cube/wrist \
  "data.train_path=[$SEGS]" \
  data.eval_path=$DATA/demos_eval.hdf5 \
  'model.vae.block_out_channels=[128,128]' model.vae.patch_size=4 \
  model.vae.norm_groups=32 \
  batch_size=64 n_grad_steps=4000 warmup_steps=100 lr=3e-4 \
  eval_every=2000 save_every=2000 \
  experiment_folder=$RUN experiment_name=vae
fi
if [ ! -f $DATA/demos_latent.hdf5 ]; then
python tools/process_latents.py vae_snapshot_path=experiments/$RUN/vae/ckpt/4000.ckpt \
  'vae.block_out_channels=[128,128]' vae.patch_size=4 vae.norm_groups=32 \
  'rgb_keys=[wrist64_image]' \
  "src_paths=[$SEGS,$DATA/demos_eval.hdf5]" \
  "dst_paths=[$LATS,$DATA/demos_eval_latent.hdf5]"
fi

if [ ! -d experiments/$RUN/ldp/ckpt/$STEPS.ckpt ]; then
python tools/train_bc.py agent=ldp_agent data=aloha_insertion/latent_wrist256 \
  "data.train_path=[$SEGS]" "data.train_latent_path=[$LATS]" \
  data.eval_path=$DATA/demos_eval.hdf5 \
  data.eval_latent_path=$DATA/demos_eval_latent.hdf5 \
  'data.oversample.channels=[6,13]' data.oversample.boost=3.0 \
  data.oversample.halfwidth=8 \
  'model_vae.block_out_channels=[128,128]' model_vae.patch_size=4 \
  model_vae.norm_groups=32 \
  agent.vae_pretrain_path=experiments/$RUN/vae/ckpt/4000.ckpt \
  agent.vae_feature_dim=256 \
  'agent.planner.down_dims=[128,256,512]' \
  agent.planner_prediction_type=sample \
  'agent.action_loss_weights=[1,1,1,1,1,1,3,1,1,1,1,1,1,3]' \
  agent.planner_n_diffusion_steps=50 agent.idm_n_diffusion_steps=50 \
  agent.planner_inference_steps=25 agent.idm_inference_steps=25 \
  data.env_params.env.episode_len=400 \
  horizon=9 obs_horizon=1 action_horizon=4 pred_horizon=8 batch_size=128 \
  n_grad_steps=$STEPS warmup_steps=500 lr=3e-4 n_eval_episodes=64 \
  eval_every=20000 save_every=10000 resume=true \
  experiment_folder=$RUN experiment_name=ldp
fi

python tools/eval_bc.py run_dir=experiments/$RUN/ldp \
  "ckpt_steps=[$((STEPS-10000)),$STEPS]" \
  n_eval_episodes=256 eval_action_horizon=1 plan_blend=0.7 sweep_batch=2

python tools/snapshot_run.py experiments/$RUN/vae experiments/$RUN/ldp
