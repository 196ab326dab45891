#!/bin/bash
# The LDP scientific-core study on the physics Lift task: does suboptimal /
# action-free data help when expert demos are scarce?
#
# Parity: reference collect_data.py + train_mixed_bc.py +
# train_mixed_bc_actionfree_rm_lift.yaml. Reference stream semantics
# (agent/ldp_agent.py:184-200): the PLANNER trains on cfg.data, the IDM on
# cfg.mixed_data — so
#   expert   : both streams = N_EXPERT expert demos          (plain BC)
#   mixed    : planner = expert-N, IDM = expert-N + suboptimal WITH actions
#   actionfree: planner = expert-N + suboptimal (actions unused by the
#               planner), IDM = expert-N only
#
# Prereq: experiments/pipeline3 artifacts (VAE + LDP on physics Lift) and
# datasets/lift/demos*.hdf5 from tools/run_lift_pipeline.sh.
set -e
# NOTE: nullglob must stay scoped to the snapshot glob below — enabling it
# globally deletes every unquoted bracket arg (down_dims=[...]) from $COMMON.
cd "$(dirname "$0")/.."
RUN=${RUN:-mixed_study}
N_EXPERT=${N_EXPERT:-8}
STEPS=${STEPS:-30000}
SUBOPT_CKPT=${SUBOPT_CKPT:-10000.ckpt}   # ~50%-success intermediate policy

VAE="experiments/pipeline3/vae/ckpt/4000.ckpt"
VAE_ARGS="model_vae.block_out_channels=[64,128,128,128] model_vae.patch_size=4 model_vae.norm_groups=16"

# 1. suboptimal corpus: roll the intermediate checkpoint with action noise,
#    keep unsuccessful episodes (reference collect_data.yaml protocol)
if [ ! -f datasets/lift/suboptimal.hdf5 ]; then
python tools/collect_data.py run_dir=experiments/pipeline3/ldp \
  ckpt_name=$SUBOPT_CKPT n_episodes=256 episode_len=80 noise=0.1 \
  unsuccessful_only=true out_path=datasets/lift/suboptimal.hdf5 seed=123
python tools/process_latents.py vae_snapshot_path=$VAE \
  'vae.block_out_channels=[64,128,128,128]' vae.patch_size=4 vae.norm_groups=16 \
  'src_paths=[datasets/lift/suboptimal.hdf5]' \
  'dst_paths=[datasets/lift/suboptimal_latent.hdf5]'
fi

COMMON="$VAE_ARGS agent.vae_pretrain_path=$VAE
  agent.planner.down_dims=[64,128,256]
  agent.planner_n_diffusion_steps=50 agent.idm_n_diffusion_steps=50
  agent.planner_inference_steps=25 agent.idm_inference_steps=25
  data.env_params.env.episode_len=80
  horizon=9 obs_horizon=1 action_horizon=4 pred_horizon=8 batch_size=128
  n_grad_steps=$STEPS warmup_steps=200 lr=3e-4 n_eval_episodes=${N_EVAL:-512}
  eval_every=$STEPS save_every=$STEPS experiment_folder=$RUN"

# stages are idempotent: a finished run (eval.csv present) is skipped, so
# the study resumes cleanly after interruptions
# 2. expert-only BC with N_EXPERT demos
if [ ! -f experiments/$RUN/expert$N_EXPERT/eval.csv ]; then
python tools/train_bc.py agent=ldp_agent data=lift/latent_img \
  data.train_n_episode_overfit=$N_EXPERT $COMMON experiment_name=expert$N_EXPERT
python tools/snapshot_run.py experiments/$RUN/expert$N_EXPERT
fi

# 3. mixed: IDM additionally sees the suboptimal actions
if [ ! -f experiments/$RUN/mixed$N_EXPERT/eval.csv ]; then
python tools/train_mixed_bc.py \
  data=lift/latent_img data.train_n_episode_overfit=$N_EXPERT \
  mixed_data=lift/mixed_latent_img \
  "mixed_data.train_n_episode_overfit=[$N_EXPERT,null]" \
  $COMMON experiment_name=mixed$N_EXPERT
python tools/snapshot_run.py experiments/$RUN/mixed$N_EXPERT
fi

# 4. action-free: planner additionally sees the suboptimal latent streams
#    (the planner never reads actions), IDM stays expert-only
if [ ! -f experiments/$RUN/actionfree$N_EXPERT/eval.csv ]; then
python tools/train_mixed_bc.py \
  data=lift/mixed_latent_img \
  "data.train_n_episode_overfit=[$N_EXPERT,null]" \
  mixed_data=lift/latent_img \
  mixed_data.train_n_episode_overfit=$N_EXPERT \
  $COMMON experiment_name=actionfree$N_EXPERT
python tools/snapshot_run.py experiments/$RUN/actionfree$N_EXPERT
fi

# persist the small evidence artifacts into the tracked tree (experiments/
# is gitignored and wiped between build sessions)
shopt -s nullglob
for d in experiments/$RUN/*/; do python tools/snapshot_run.py "$d"; done
shopt -u nullglob

python - <<'PYEOF'
import csv, glob, math
print("== mixed-study results (95% binomial CI) ==")
for f in sorted(glob.glob("experiments/mixed_study/*/eval.csv")):
    rows = list(csv.DictReader(open(f)))
    if rows:
        r = rows[-1]
        p_hat, n = float(r["success"]), float(r["n_episodes"])
        half = 1.96 * math.sqrt(max(p_hat * (1 - p_hat), 1e-9) / n)
        print(f"{f.split('/')[-2]:>16}: success {p_hat:.3f} "
              f"+/- {half:.3f} (n={n:.0f}) @ step {r.get('step')}")
PYEOF
