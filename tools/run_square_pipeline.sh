#!/bin/bash
# Self-contained LDP pipeline on the CONTACT-PHYSICS Square nut-assembly
# task (reference recipe: demos -> VAE -> latents -> LDP -> eval; the
# reference wraps robosuite NutAssemblySquare, envs/robosuite_env.py +
# data/cfg/rm_square/** + train_mixed_bc_rm_square.yaml).
#
# The env is SquarePhysicsEnv (envs/pick_place_physics.py:419): a rigid
# 4-bar nut frame over the penalty-contact engine; success requires the
# frame physically dropped over the peg. Recipe mirrors
# tools/run_can_pipeline.sh (patchified VAE, [64,128,256] planner, DDPM-50
# train / DDIM-25 eval); the scripted expert finishes in ~220 steps, eval
# at the reference's 400-step protocol.
set -e
cd "$(dirname "$0")/.."
RUN=${RUN:-square_pipeline}
STEPS=${STEPS:-30000}
ENV=latent_diffusion_planning_tpu.envs.pick_place_physics.SquarePhysicsEnv
DATA=datasets/square

if [ ! -f $DATA/demos.hdf5 ]; then
python tools/collect_demos.py env._target_=$ENV env.episode_len=300 \
  n_episodes=256 episode_len=300 out_path=$DATA/demos.hdf5 seed=0
python tools/collect_demos.py env._target_=$ENV env.episode_len=300 \
  n_episodes=32 episode_len=300 out_path=$DATA/demos_eval.hdf5 seed=77
fi
if [ ! -d experiments/$RUN/vae/ckpt/4000.ckpt ]; then
python tools/train_vae.py data=square/img \
  data.train_path=$DATA/demos.hdf5 data.eval_path=$DATA/demos_eval.hdf5 \
  'model.vae.block_out_channels=[64,128,128,128]' model.vae.patch_size=4 \
  model.vae.norm_groups=16 \
  batch_size=64 n_grad_steps=4000 warmup_steps=100 lr=3e-4 \
  eval_every=2000 save_every=2000 \
  experiment_folder=$RUN experiment_name=vae
fi
if [ ! -f $DATA/demos_latent.hdf5 ]; then
python tools/process_latents.py vae_snapshot_path=experiments/$RUN/vae/ckpt/4000.ckpt \
  'vae.block_out_channels=[64,128,128,128]' vae.patch_size=4 vae.norm_groups=16 \
  'src_paths=['$DATA'/demos.hdf5,'$DATA'/demos_eval.hdf5]' \
  'dst_paths=['$DATA'/demos_latent.hdf5,'$DATA'/demos_eval_latent.hdf5]'
fi
if [ ! -d experiments/$RUN/ldp/ckpt/$STEPS.ckpt ]; then
python tools/train_bc.py agent=ldp_agent data=square/latent_img \
  'model_vae.block_out_channels=[64,128,128,128]' model_vae.patch_size=4 \
  model_vae.norm_groups=16 \
  agent.vae_pretrain_path=experiments/$RUN/vae/ckpt/4000.ckpt \
  'agent.planner.down_dims=[64,128,256]' \
  agent.planner_n_diffusion_steps=50 agent.idm_n_diffusion_steps=50 \
  agent.planner_inference_steps=25 agent.idm_inference_steps=25 \
  'data.stats_from_data=[latent_agentview_image]' \
  data.env_params.env.episode_len=400 \
  horizon=9 obs_horizon=1 action_horizon=4 pred_horizon=8 batch_size=128 \
  n_grad_steps=$STEPS warmup_steps=200 lr=3e-4 n_eval_episodes=256 \
  eval_every=10000 save_every=10000 \
  experiment_folder=$RUN experiment_name=ldp
fi

# persist the small evidence artifacts into the tracked tree
python tools/snapshot_run.py experiments/$RUN/vae experiments/$RUN/ldp
