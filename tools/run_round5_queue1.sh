#!/bin/bash
# Round-5 TPU job queue #1: the capability matrix (VERDICT r4 items 1+4).
# Single chip — strictly sequential; every stage is idempotent and logged;
# one failing stage does not kill the queue (fix + rerun resumes cleanly).
#   1. re-score the round-4 phys3 ALOHA checkpoint at 256 episodes on the
#      CORRECTED contact-reward ladder (honest re-baseline; the geometry
#      fix also changes grasp dynamics, so this measures the stale policy
#      under the fixed env — the retrain ships in queue #2)
#   2. mixed-data study at 20k steps / 512-episode evals (round-4 rerun was
#      VOID to the nullglob bug; stale wrong-arch run dirs are wiped first)
#   3. baselines matrix DP / DPVAE / LDP-hier on physics Lift
#   4. contact-physics Can pipeline end-to-end
set -u
cd "$(dirname "$0")/.."
mkdir -p logs

if [ -d experiments/aloha_phys3/ldp/ckpt ]; then
  python tools/eval_bc.py run_dir=experiments/aloha_phys3/ldp \
    'ckpt_steps=[60000]' n_eval_episodes=256 eval_action_horizon=1 \
    plan_blend=0.7 > logs/r5_phys3_rescore.log 2>&1 || true
  python tools/snapshot_run.py experiments/aloha_phys3/ldp || true
fi

# stale mixed-study dirs carry the wrong-architecture (nullglob) training
# state — a fresh start is the only trustworthy one
rm -rf experiments/mixed_study
STEPS=20000 N_EVAL=512 bash tools/run_lift_mixed_study.sh \
  > logs/r5_mixed_study.log 2>&1 || true

bash tools/run_lift_baselines.sh > logs/r5_baselines.log 2>&1 || true

bash tools/run_can_pipeline.sh > logs/r5_can.log 2>&1 || true

echo "round-5 queue #1 complete"
