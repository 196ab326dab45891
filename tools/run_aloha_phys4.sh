#!/bin/bash
# ALOHA transfer-cube LDP pipeline, round-5 ("phys4").
#
# Rebuilds the phys3 recipe from scratch on the CORRECTED contact geometry
# (round-5 fix: FINGER_MAX_HALFGAP tracks the real ViperX slide — the old
# 0.045 put the reset-pose gripper 1 mm into contact and over-credited
# proximity as touch, so phys3 demos/checkpoints are measured against a
# broken ladder AND trained in a subtly different action space), plus the
# three diagnosed round-4 levers, in order of expected effect:
#
#   1. handover oversampling  — data.oversample on the two gripper action
#      channels (6, 13): grasp/handover events are a few steps out of ~90
#      and uniform window sampling starves them (VERDICT r4 lever a).
#   2. gripper loss weighting — agent.action_loss_weights 3x on channels
#      6/13: the under-committed right-gripper close (0.71 vs expert 0.88
#      at the handover) is a loss-scale problem, 2 scalar channels vs 12
#      joint channels (lever b).
#   3. 200k-step budget       — phys3 stopped at 60k with train loss still
#      falling (lever c).
#
# Eval keeps lever d (action_horizon=1 + plan_blend=0.7) for the final
# 256-episode protocol sweep via eval_bc.
set -e
cd "$(dirname "$0")/.."
RUN=${RUN:-aloha_phys4}
STEPS=${STEPS:-200000}
ENV=latent_diffusion_planning_tpu.envs.aloha_cube.AlohaTransferCubeEnv

# Cheap guaranteed evidence first: the streamed fused-sampler real-TPU smoke
# (HBM weight streaming for reference-scale nets) takes <15 min and must not
# be starved by the long train below.
if [ ! -s logs/r5_streamsmoke2.log ]; then
  timeout 900 python tools/smoke_streamed_sampler.py \
    > logs/r5_streamsmoke2.log 2>&1 || true
  git add logs/r5_streamsmoke2.log >/dev/null 2>&1 || true
  git commit -m "Round-5 queue: streamed fused-sampler real-TPU smoke" \
    >/dev/null 2>&1 || true
fi
DATA=datasets/aloha_cube_phys4
SEGS="$DATA/demos.hdf5,$DATA/demos_n3.hdf5,$DATA/demos_n5.hdf5"
LATS="$DATA/demos_latent.hdf5,$DATA/demos_n3_latent.hdf5,$DATA/demos_n5_latent.hdf5"

if [ ! -f $DATA/demos_eval.hdf5 ]; then
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

# Deadline-aware training budget: when a round-end hard deadline is posted
# (epoch seconds in /tmp/round5_hard_deadline), cap STEPS so train + the
# 3x256-episode protocol sweep finish before it. Rate: phys3 trained the
# same-shape LDP at ~39-52 steps/s (assets/runs/aloha_phys3/ldp/
# train_tail.csv); budget at a conservative 30 steps/s, reserve 1800 s for
# the sweep + snapshots, floor at 20k, round down to save_every (10k).
if [ -f /tmp/round5_hard_deadline ]; then
  _left=$(( $(cat /tmp/round5_hard_deadline) - $(date +%s) - 1800 ))
  if [ "$_left" -gt 0 ]; then
    _cap=$(( _left * 30 / 10000 * 10000 ))
    [ "$_cap" -lt 20000 ] && _cap=20000
    [ "$_cap" -lt "$STEPS" ] && { echo "deadline cap: STEPS $STEPS -> $_cap"; STEPS=$_cap; }
  fi
fi

if [ ! -d experiments/$RUN/ldp/ckpt/$STEPS.ckpt ]; then
python tools/train_bc.py agent=ldp_agent data=aloha_cube/latent_wrist256 \
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

# protocol sweep on the last (up to) three checkpoints at the round-4 best
# knobs; sweep_batch fuses them into one vmapped device program (falls back
# to sequential per-ckpt calls on any failure). Only steps with an existing
# checkpoint make the list — the deadline cap can shrink the ladder.
CKPTS=""
NSW=0
for s in $((STEPS-20000)) $((STEPS-10000)) $STEPS; do
  if [ "$s" -gt 0 ] && [ -d experiments/$RUN/ldp/ckpt/$s.ckpt ]; then
    CKPTS="$CKPTS,$s"; NSW=$((NSW+1))
  fi
done
CKPTS=${CKPTS#,}
if [ "$NSW" -gt 0 ]; then
python tools/eval_bc.py run_dir=experiments/$RUN/ldp \
  "ckpt_steps=[$CKPTS]" \
  n_eval_episodes=256 eval_action_horizon=1 plan_blend=0.7 sweep_batch=$NSW
fi

python tools/snapshot_run.py experiments/$RUN/vae experiments/$RUN/ldp
