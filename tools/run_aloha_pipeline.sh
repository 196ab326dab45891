#!/bin/bash
# Self-contained LDP pipeline on the joint-space bimanual ALOHA transfer-cube
# task (reference recipe: scripted demos -> VAE -> latents -> LDP -> eval).
# Demos use the IK scripted expert over the exact-MJCF ViperX chains; actions
# are absolute joint targets + normalized grippers (envs/aloha_cube.py).
set -e
cd "$(dirname "$0")/.."
RUN=${RUN:-aloha_pipeline}
ENV=latent_diffusion_planning_tpu.envs.aloha_cube.AlohaTransferCubeEnv
python tools/collect_demos.py env._target_=$ENV \
  n_episodes=128 episode_len=100 out_path=datasets/aloha_cube/demos.hdf5 seed=0
python tools/collect_demos.py env._target_=$ENV \
  n_episodes=32 episode_len=100 out_path=datasets/aloha_cube/demos_eval.hdf5 seed=77
python tools/train_vae.py data=aloha_cube/wrist \
  data.train_path=datasets/aloha_cube/demos.hdf5 \
  data.eval_path=datasets/aloha_cube/demos_eval.hdf5 \
  'model.vae.block_out_channels=[64,128,128,128]' model.vae.patch_size=4 \
  model.vae.norm_groups=16 \
  batch_size=64 n_grad_steps=4000 warmup_steps=100 lr=3e-4 \
  eval_every=2000 save_every=2000 \
  experiment_folder=$RUN experiment_name=vae
python tools/process_latents.py vae_snapshot_path=experiments/$RUN/vae/ckpt/4000.ckpt \
  'vae.block_out_channels=[64,128,128,128]' vae.patch_size=4 vae.norm_groups=16 \
  'rgb_keys=[wrist64_image]' \
  'src_paths=[datasets/aloha_cube/demos.hdf5,datasets/aloha_cube/demos_eval.hdf5]' \
  'dst_paths=[datasets/aloha_cube/demos_latent.hdf5,datasets/aloha_cube/demos_eval_latent.hdf5]'
python tools/train_bc.py agent=ldp_agent data=aloha_cube/latent_wrist \
  'model_vae.block_out_channels=[64,128,128,128]' model_vae.patch_size=4 \
  model_vae.norm_groups=16 \
  agent.vae_pretrain_path=experiments/$RUN/vae/ckpt/4000.ckpt \
  'agent.planner.down_dims=[64,128,256]' \
  agent.planner_n_diffusion_steps=50 agent.idm_n_diffusion_steps=50 \
  agent.planner_inference_steps=25 agent.idm_inference_steps=25 \
  data.env_params.env.episode_len=100 \
  horizon=9 obs_horizon=1 action_horizon=4 pred_horizon=8 batch_size=128 \
  n_grad_steps=30000 warmup_steps=200 lr=3e-4 n_eval_episodes=64 \
  eval_every=10000 save_every=10000 \
  experiment_folder=$RUN experiment_name=ldp
