#!/bin/bash
# ALOHA transfer-cube eval-knob sweep (VERDICT r3 #1 levers): replan cadence
# (eval_action_horizon), DDIM step count, and ACT-style temporal ensembling
# (plan_blend) on a trained checkpoint — all eval-time knobs, no retraining.
# Results land in experiments/<run>/ldp/eval_sweep/eval.csv (snapshotted).
#
# Usage: RUN=aloha_phys CKPT_STEP=60000 bash tools/run_aloha_knob_sweep.sh
set -e
cd "$(dirname "$0")/.."
RUN=${RUN:-aloha_phys}
DIR=experiments/$RUN/ldp
N_EVAL=${N_EVAL:-256}
CKPT_STEP=${CKPT_STEP:-60000}

run_one () {  # label, extra overrides...
  local label=$1; shift
  echo "== knob config: $label ($*)"
  python tools/eval_bc.py run_dir=$DIR n_eval_episodes=$N_EVAL \
    "ckpt_steps=[$CKPT_STEP]" "$@" \
    2>&1 | grep -E "ckpt [0-9]+:" | sed "s/^/[$label] /"
}

run_one baseline
run_one ddim50 agent.planner_inference_steps=50 agent.idm_inference_steps=50
run_one ah2 eval_action_horizon=2
run_one ah8 eval_action_horizon=8
run_one blend05 plan_blend=0.5
run_one ah2_blend05 eval_action_horizon=2 plan_blend=0.5
run_one ah1_blend07 eval_action_horizon=1 plan_blend=0.7

python tools/snapshot_run.py $DIR
