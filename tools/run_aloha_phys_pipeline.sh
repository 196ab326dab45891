#!/bin/bash
# Self-contained LDP pipeline on the CONTACT-PHYSICS bimanual ALOHA
# transfer-cube task (reference recipe: scripted demos -> VAE -> latents ->
# LDP -> eval). Round-4 (v2) recipe changes over the round-3 run:
#   - DART-style demo mixture: clean demos plus block-held noise-injected
#     segments (sigma 0.003 / 0.005, draw held 10 steps — the reference's
#     collect_aloha_scripted_demos.py inject_noise perturbs interpolation
#     waypoints, i.e. low-frequency). The state-feedback expert's
#     corrections back to the nominal trajectory land IN the data, so a
#     policy that drifts or misses the grasp sees recovery supervision —
#     round-3 demos were narrow clean successes and the closed-loop policy
#     continued the carry open-loop after a missed grasp (~4% success).
#   - noisy segments run 250-step episodes so expert retries fit; only
#     successful episodes are kept (yield: 100% / ~95% / ~78%).
#   - 256-dim VAE latents, measured normalization bounds, x0-prediction
#     planner, eval episode_len 400 — unchanged from round 3 (RESULTS.md).
set -e
cd "$(dirname "$0")/.."
RUN=${RUN:-aloha_phys2}
STEPS=${STEPS:-60000}
ENV=latent_diffusion_planning_tpu.envs.aloha_cube.AlohaTransferCubeEnv
DATA=datasets/aloha_cube_phys2
SEGS="$DATA/demos.hdf5,$DATA/demos_n3.hdf5,$DATA/demos_n5.hdf5"
LATS="$DATA/demos_latent.hdf5,$DATA/demos_n3_latent.hdf5,$DATA/demos_n5_latent.hdf5"
python tools/collect_demos.py env._target_=$ENV \
  n_episodes=128 episode_len=150 out_path=$DATA/demos.hdf5 seed=0
python tools/collect_demos.py env._target_=$ENV \
  n_episodes=288 episode_len=250 noise=0.003 noise_hold=10 \
  out_path=$DATA/demos_n3.hdf5 seed=1
python tools/collect_demos.py env._target_=$ENV \
  n_episodes=320 episode_len=250 noise=0.005 noise_hold=10 \
  out_path=$DATA/demos_n5.hdf5 seed=2
python tools/collect_demos.py env._target_=$ENV \
  n_episodes=32 episode_len=150 out_path=$DATA/demos_eval.hdf5 seed=77
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
  eval_every=10000 save_every=10000 \
  experiment_folder=$RUN experiment_name=ldp

# persist the small evidence artifacts into the tracked tree (experiments/
# is gitignored and wiped between build sessions)
python tools/snapshot_run.py experiments/$RUN/vae experiments/$RUN/ldp
