#!/bin/bash
# Baseline-agent comparison on the physics Lift task — the reference's
# agent surface (agent/dp_agent.py, agent/dp_repr_agent.py,
# agent/ldp_hier_agent.py) trained end-to-end on the same artifacts as the
# LDP pipeline (tools/run_lift_pipeline.sh must have completed first:
# datasets/lift/* + experiments/pipeline3/vae).
#
# Budgets are reduced vs the reference's 500k (the device Lift task trains
# to ceiling at 30k — RESULTS.md); network scale mirrors the LDP pipeline
# ([64,128,256] U-Nets, DDPM-50 train / DDIM-25 eval).
#
# DP/DPVAE denoise the raw action window, so their data horizon must be
# divisible by the U-Net downsample factor (4): horizon=8 == pred_horizon.
# LDP-hier keeps horizon=9 (planner predicts 8 future latents).
set -e
# NOTE: nullglob must stay scoped to the snapshot glob below — enabling it
# globally deletes every unquoted bracket arg (down_dims=[...]) from $COMMON.
cd "$(dirname "$0")/.."
RUN=${RUN:-baselines}
STEPS=${STEPS:-30000}

VAE="experiments/pipeline3/vae/ckpt/4000.ckpt"
VAE_ARGS="model_vae.block_out_channels=[64,128,128,128] model_vae.patch_size=4 model_vae.norm_groups=16"

COMMON="data.env_params.env.episode_len=80
  obs_horizon=1 action_horizon=4 batch_size=128
  warmup_steps=200 lr=3e-4 n_eval_episodes=256
  experiment_folder=$RUN"

# stages are idempotent: a run is considered finished only once its
# final checkpoint exists (eval.csv alone can be the half-budget eval)
# 1. Diffusion Policy from raw pixels (trained ResNet-18 encoder end-to-end)
if [ ! -d experiments/$RUN/dp/ckpt/$STEPS.ckpt ]; then
python tools/train_bc.py agent=dp_agent data=lift/img \
  'agent.planner.down_dims=[64,128,256]' \
  agent.n_diffusion_steps=50 agent.inference_steps=25 \
  horizon=8 pred_horizon=8 \
  n_grad_steps=$STEPS eval_every=$((STEPS/2)) save_every=$((STEPS/2)) \
  resume=true \
  $COMMON experiment_name=dp
python tools/snapshot_run.py experiments/$RUN/dp
fi

# 2. DP over frozen VAE latents
if [ ! -d experiments/$RUN/dp_vae/ckpt/$STEPS.ckpt ]; then
python tools/train_bc.py agent=dp_repr_agent data=lift/latent_img \
  $VAE_ARGS agent.vae_pretrain_path=$VAE \
  'agent.planner.down_dims=[64,128,256]' \
  agent.n_diffusion_steps=50 agent.inference_steps=25 \
  horizon=8 pred_horizon=8 \
  n_grad_steps=$STEPS eval_every=$((STEPS/2)) save_every=$((STEPS/2)) \
  resume=true \
  $COMMON experiment_name=dp_vae
python tools/snapshot_run.py experiments/$RUN/dp_vae
fi

# 3. Hierarchical LDP (strided planner + chunk-decoding U-Net IDM)
if [ ! -d experiments/$RUN/ldp_hier/ckpt/$STEPS.ckpt ]; then
python tools/train_bc.py agent=ldp_hier_agent data=lift/latent_img \
  $VAE_ARGS agent.vae_pretrain_path=$VAE \
  'agent.planner.down_dims=[64,128,256]' \
  'agent.idm_net.down_dims=[64,128]' \
  agent.planner_n_diffusion_steps=50 agent.idm_n_diffusion_steps=50 \
  agent.planner_inference_steps=25 agent.idm_inference_steps=25 \
  horizon=9 pred_horizon=8 idm_horizon=4 \
  n_grad_steps=$STEPS eval_every=$((STEPS/2)) save_every=$((STEPS/2)) \
  resume=true \
  $COMMON experiment_name=ldp_hier
python tools/snapshot_run.py experiments/$RUN/ldp_hier
fi

# persist the small evidence artifacts into the tracked tree (experiments/
# is gitignored and wiped between build sessions)
shopt -s nullglob
for d in experiments/$RUN/*/; do python tools/snapshot_run.py "$d"; done
shopt -u nullglob

python - <<'PYEOF'
import csv, glob
print("== baseline results ==")
for f in sorted(glob.glob("experiments/baselines/*/eval.csv")):
    rows = list(csv.DictReader(open(f)))
    if rows:
        r = rows[-1]
        print(f"{f.split('/')[-2]:>10}: success {r.get('success')} "
              f"@ step {r.get('step')}")
PYEOF
